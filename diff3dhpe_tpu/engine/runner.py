"""Training/evaluation runner: the reference's epoch loop and evaluation
protocol (reference run.py:252-506 and evaluate:535-654) as a reusable
component on top of the jitted steps.

Responsibilities: model/diffusion/mesh assembly, the epoch loop (train ->
flip-TTA validation -> logging -> periodic/best checkpointing -> early-stop /
max-time / lr decay), and the final per-action evaluation with Protocols
#1/#2/#3 + MPJVE and eval-throughput reporting.
"""
from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diff3dhpe_tpu.config import Config
from diff3dhpe_tpu.diffusion import GaussianDiffusion
from diff3dhpe_tpu.engine.steps import (
    build_train_state,
    make_denoise_fn,
    make_eval_step,
    make_optimizer,
    make_train_step,
    make_val_step,
)
from diff3dhpe_tpu.io.checkpoint import (
    restore_checkpoint,
    rng_state_from_json,
    rng_state_to_json,
    save_checkpoint,
)
from diff3dhpe_tpu.metrics import mean_velocity_error, mpjpe, n_mpjpe, p_mpjpe
from diff3dhpe_tpu.models import HPE_model
from diff3dhpe_tpu.parallel import make_mesh, shard_params


class RunLogger:
    """Timestamped plain-text run logs, mirroring the reference's
    config_*/log_*/results_* files (reference run.py:136-138,209-214)."""

    def __init__(self, checkpoint_dir: str, enabled: bool = True):
        self.enabled = enabled
        self.config_path = self.log_path = self.results_path = None
        if not enabled:
            return
        os.makedirs(checkpoint_dir, exist_ok=True)
        stamp = time.strftime("%Hh%Mm%Ss_on_%b_%d_%Y")
        self.config_path = os.path.join(checkpoint_dir, f"config_{stamp}.txt")
        self.log_path = os.path.join(checkpoint_dir, f"log_{stamp}.txt")
        self.results_path = os.path.join(checkpoint_dir, f"results_{stamp}.txt")

    def _write(self, path, text):
        if self.enabled:
            with open(path, "a") as f:
                f.write(text)

    def config(self, text):
        self._write(self.config_path, text)

    def log(self, text):
        print(text, end="" if text.endswith("\n") else "\n")
        self._write(self.log_path, text if text.endswith("\n") else text + "\n")

    def result(self, text):
        print(text, end="" if text.endswith("\n") else "\n")
        self._write(self.results_path, text if text.endswith("\n") else text + "\n")


def dataclasses_replace_denoise(diffusion, denoise_fn):
    import dataclasses as _dc

    return _dc.replace(diffusion, denoise_fn=denoise_fn)


class Runner:
    def __init__(
        self,
        cfg: Config,
        num_joints: int,
        joints_left,
        joints_right,
        mesh=None,
        logger: Optional[RunLogger] = None,
    ):
        self.cfg = cfg
        self.num_joints = num_joints
        self.joints_left = list(joints_left)
        self.joints_right = list(joints_right)
        jax.config.update("jax_default_matmul_precision", cfg.matmul_precision)
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh_shape)
        self.logger = logger or RunLogger(cfg.checkpoint, enabled=False)

        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        self.model = HPE_model(cfg.model)(
            num_frame=cfg.number_of_frames,
            num_joints=num_joints,
            in_chans=2,
            embed_dim=cfg.embed_dim,
            depth=cfg.transformer_depth,
            num_heads=cfg.num_heads,
            mlp_ratio=cfg.mlp_ratio,
            qkv_bias=True,
            drop_path_rate=cfg.drop_path_rate,
            with_time_emb=cfg.with_time_emb,
            use_pallas=cfg.use_pallas_attention,
            dtype=dtype,
            remat_blocks=cfg.remat and cfg.remat_mode == "block",
        )
        self.diffusion = GaussianDiffusion.create(
            make_denoise_fn(
                self.model,
                remat=cfg.remat and cfg.remat_mode == "whole",
            ),
            timesteps=cfg.timesteps,
            sampling_timesteps=cfg.sampling_timesteps,
            loss_type=cfg.loss_type,
            clip_denoised=cfg.clip_denoised,
            beta_schedule=cfg.beta_schedule,
            ddim_sampling_eta=cfg.ddim_sampling_eta,
            clip_loss=cfg.clip_loss,
            mode="s2s" if cfg.out_all else "s2f",
        )
        if cfg.fast_eval:
            import dataclasses as _dc

            from diff3dhpe_tpu.engine.steps import make_fast_denoise_fn

            fast_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
            is_bf16 = fast_dtype == jnp.bfloat16
            fast_kwargs = dict(
                num_frame=cfg.number_of_frames, num_joints=num_joints,
                depth=cfg.transformer_depth, num_heads=cfg.num_heads,
                with_time_emb=cfg.with_time_emb,
                mode="s2s" if cfg.out_all else "s2f",
            )
            self.eval_diffusion = dataclasses_replace_denoise(
                self.diffusion,
                make_fast_denoise_fn(
                    dtype=fast_dtype, f32_head=is_bf16 and cfg.eval_f32_head,
                    **fast_kwargs,
                ),
            )
            if is_bf16 and cfg.eval_f32_final_steps > 0:
                # Mixed precision: the last N DDIM steps run an f32 fused
                # forward (GaussianDiffusion.ddim_sample_loop unrolls them
                # after the bf16 scan) with the contraction mode pinned by
                # eval_final_prec ("high3" = the accuracy-study winner).
                # eval_f32_tail_pairs > 0 further splits that final-step
                # forward: only its last N block pairs + head run f32.
                if cfg.eval_f32_tail_pairs > 0:
                    final_fn = make_fast_denoise_fn(
                        dtype=jnp.bfloat16, f32_head=True,
                        f32_prec=cfg.eval_final_prec,
                        f32_tail_pairs=cfg.eval_f32_tail_pairs,
                        **fast_kwargs,
                    )
                else:
                    final_fn = make_fast_denoise_fn(
                        dtype=jnp.float32, f32_prec=cfg.eval_final_prec,
                        **fast_kwargs,
                    )
                self.eval_diffusion = _dc.replace(
                    self.eval_diffusion,
                    final_denoise_fn=final_fn,
                    final_denoise_steps=cfg.eval_f32_final_steps,
                )
        else:
            self.eval_diffusion = self.diffusion
        if cfg.fast_train:
            from diff3dhpe_tpu.engine.steps import make_fast_train_denoise_fn

            train_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
            self.train_diffusion = dataclasses_replace_denoise(
                self.diffusion,
                make_fast_train_denoise_fn(
                    num_frame=cfg.number_of_frames, num_joints=num_joints,
                    depth=cfg.transformer_depth, num_heads=cfg.num_heads,
                    with_time_emb=cfg.with_time_emb,
                    mode="s2s" if cfg.out_all else "s2f",
                    dtype=train_dtype, drop_path_rate=cfg.drop_path_rate,
                    pair_vjp=cfg.fast_train_pair_vjp,
                    attn_bwd=cfg.fast_train_attn_bwd,
                ),
            )
        else:
            self.train_diffusion = self.diffusion
        self.eval_step = make_eval_step(
            self.eval_diffusion, self.joints_left, self.joints_right,
            mesh=self.mesh, repeat_n=cfg.repeat_n, tta=cfg.test_time_augmentation,
        )
        self.val_step = make_val_step(
            self.diffusion, self.joints_left, self.joints_right, mesh=self.mesh,
            sample_diffusion=self.eval_diffusion, tta=cfg.test_time_augmentation,
        )
        self._optimizer = None
        self.state = None

    # ------------------------------------------------------------------
    def init_params(self, seed: Optional[int] = None):
        key = jax.random.PRNGKey(self.cfg.seed if seed is None else seed)
        f_in = self.cfg.number_of_frames
        dummy_x = jnp.zeros((1, f_in, self.num_joints, 5))
        params = self.model.init(key, dummy_x, jnp.zeros((1,)))["params"]
        return shard_params(params, self.mesh)

    def set_params(self, params):
        params = shard_params(params, self.mesh)
        if self.state is None:
            opt = self._optimizer or make_optimizer(
                self.cfg.learning_rate, self.cfg.lr_decay, 1, self.cfg.weight_decay
            )
            self._optimizer = opt
            self.state = build_train_state(params, opt)
        else:
            self.state = self.state.replace(params=params)

    def param_count(self) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(self.state.params))

    # ------------------------------------------------------------------
    def fit(self, train_ds, val_ds, resume: Optional[str] = None):
        """Epoch loop. Per-epoch validation and early stopping run on
        ``val_ds`` — the reference's 'val' split (train subjects, no
        augmentation, its own noise knobs; reference run.py:278-284 and
        load_noisy_data.py:95-107). The reference's own epoch loop iterates
        the test loader (run.py:364) despite building that val dataset; we
        validate on the val split to keep the test set out of early
        stopping. The final test evaluation is a separate `evaluate` call.
        """
        cfg = self.cfg
        log = self.logger
        steps_per_epoch = max(len(train_ds) // cfg.batch_size, 1)
        self._optimizer = make_optimizer(
            cfg.learning_rate, cfg.lr_decay, steps_per_epoch, cfg.weight_decay
        )
        if self.state is None:
            self.state = build_train_state(self.init_params(), self._optimizer)
        else:
            self.state = build_train_state(self.state.params, self._optimizer)
        train_step = make_train_step(self.train_diffusion, self._optimizer, mesh=self.mesh)

        epoch = 0
        best_epoch = 0
        min_loss = np.inf
        min_train_loss = np.inf
        curr_step = 0
        key = jax.random.PRNGKey(cfg.seed)

        if resume:
            self.state, meta = restore_checkpoint(resume, self.state)
            epoch = meta["epoch"] + 1
            best_epoch = meta.get("best_epoch", 0)
            min_loss = meta.get("min_loss", np.inf)
            min_train_loss = meta.get("min_train_loss", np.inf)
            if meta.get("shuffle_rng_state"):
                train_ds.shuffle_rng = rng_state_from_json(meta["shuffle_rng_state"])
            key = jax.random.PRNGKey(cfg.seed + epoch)
            log.log(f"Resumed from {resume} at epoch {epoch}\n")

        losses_train: List[float] = []
        losses_valid: List[float] = []
        start_training_time = time.time()
        best_path = os.path.join(cfg.checkpoint, "best_epoch")

        while epoch < cfg.epochs:
            start_time = time.time()
            epoch_losses = []
            for b in train_ds.batches(cfg.batch_size, shuffle=True, drop_last=True):
                key, sub = jax.random.split(key)
                self.state, loss = train_step(
                    self.state, sub, jnp.asarray(b.gt_3d_norm), jnp.asarray(b.input_2d)
                )
                epoch_losses.append(loss)
            train_loss = float(np.mean(jax.device_get(epoch_losses)))
            losses_train.append(train_loss)

            if not cfg.no_eval:
                val_mpjpe, val_loss = self._validate(val_ds, key)
                losses_valid.append(val_mpjpe)
            else:
                val_mpjpe, val_loss = np.nan, np.nan

            elapsed = (time.time() - start_time) / 60
            log.log(
                f"Epoch: {epoch}, Time(mins): {elapsed:.2f}, "
                f"Train/_pose_loss: {train_loss:.8f}, "
                f"Valid/_mpjpe_mm: {val_mpjpe * 1000:.4f}, Valid/_pose_loss: {val_loss:.8f}\n"
            )

            meta = dict(
                epoch=epoch,
                best_epoch=best_epoch,
                min_loss=float(min_loss),
                min_train_loss=float(min_train_loss),
                shuffle_rng_state=rng_state_to_json(train_ds.shuffle_rng),
            )
            if (epoch + 1) % cfg.checkpoint_frequency == 0:
                path = os.path.join(cfg.checkpoint, f"epoch_{epoch}")
                save_checkpoint(path, self.state, meta)
                log.log(f"Saved checkpoint to {path}\n")

            if not cfg.no_eval and val_mpjpe * 1000 < min_loss:
                min_loss = val_mpjpe * 1000
                min_train_loss = train_loss
                best_epoch = epoch
                meta.update(best_epoch=best_epoch, min_loss=float(min_loss),
                            min_train_loss=float(min_train_loss))
                save_checkpoint(best_path, self.state, meta)
                log.log("save best checkpoint\n")
                curr_step = 0
            else:
                curr_step += 1

            if curr_step >= cfg.patience:
                log.log("Early stop!\n")
                break
            if time.time() - start_training_time > cfg.max_time * 3600:
                log.log(f"Max_time for training elapsed {cfg.max_time:.2f} hours, stopping\n")
                break
            epoch += 1

        log.log(f"Training finished! Total time: {(time.time() - start_training_time) / 60}\n")
        if cfg.export_training_curves and len(losses_train) > 3:
            self._export_curves(losses_train, losses_valid)
        return dict(
            losses_train=losses_train,
            losses_valid=losses_valid,
            best_epoch=best_epoch,
            min_loss=min_loss,
            best_path=best_path if os.path.isdir(best_path) else None,
        )

    def _export_curves(self, losses_train, losses_valid):
        """Loss-curve PNG (reference run.py:513-531)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure()
        epoch_x = np.arange(3, len(losses_train)) + 1
        plt.plot(epoch_x, losses_train[3:], "--", color="C0", label="train loss")
        if len(losses_valid) > 3:
            plt.plot(epoch_x[: len(losses_valid) - 3], losses_valid[3:], color="C1",
                     label="valid MPJPE (m)")
        plt.legend()
        plt.ylabel("loss / MPJPE (m)")
        plt.xlabel("Epoch")
        plt.savefig(os.path.join(self.cfg.checkpoint, "loss_3d.png"))
        plt.close("all")

    def _validate(self, val_ds, key):
        """Per-epoch validation pass. Returns (mpjpe, loss):

        - mpjpe: frame-mask-weighted MPJPE over real (non-padded) rows — the
          early-stop / best-checkpoint signal.
        - loss: plain mean of the per-batch p_losses values, matching the
          reference's logged val loss (run.py:353-406 averages the loader's
          batch losses uniformly), so Valid/_pose_loss lines are comparable
          to reference training logs. The final fixed-shape batch pads by
          repeating its last real row, so padding contributes real data.
        """
        errs, losses, n = [], [], 0
        for b in val_ds.batches(self.cfg.batch_size_eval):
            key, sub = jax.random.split(key)
            pred_norm, loss = self.val_step(
                self.state.params, sub,
                jnp.asarray(b.gt_3d_norm), jnp.asarray(b.input_2d),
                jnp.asarray(b.input_2d_flip if b.input_2d_flip is not None else b.input_2d),
            )
            pred = val_ds.reverse_norm_3d_pose(np.asarray(pred_norm))
            mask = (b.target_mask & b.row_mask[:, None]).reshape(-1)
            pred_f = pred.reshape(-1, self.num_joints, 3)[mask]
            gt_f = b.gt_3d.reshape(-1, self.num_joints, 3)[mask]
            errs.append(float(mpjpe(pred_f[:, None], gt_f[:, None])) * mask.sum())
            losses.append(float(loss))
            n += mask.sum()
        return (np.sum(errs) / n, np.mean(losses)) if n else (np.nan, np.nan)

    # ------------------------------------------------------------------
    def evaluate(self, test_ds, action: Optional[str] = None, key=None,
                 unit_scale: float = 1000.0) -> Dict:
        """Final evaluation protocol (reference evaluate:535-654): flip-TTA
        DDIM sampling, unnormalise, mask, Protocol #1/#2/#3 + MPJVE, and
        model-time throughput.

        unit_scale converts the dataset's native pose units into the mm the
        report prints: 1000 for meter-based datasets (H3.6M et al.), 1.0 for
        MPI-INF-3DHP whose poses are already mm (the reference likewise skips
        the x1000 there, run_3dhp.py:561-568)."""
        cfg = self.cfg
        log = self.logger
        if key is None:
            key = jax.random.PRNGKey(cfg.seed)
        e1_sum = e2_sum = e3_sum = ev_sum = 0.0
        n = 0
        model_time = 0.0
        predictions = []
        # Compile warm-up OUTSIDE the timed path: remote-TPU compiles take
        # minutes and would otherwise dominate the reported inference_speed.
        # Batches are fixed-shape (the final partial batch is row-padded,
        # Dataset.batches), so ONE batch compiles the single program; the
        # warm-up uses a throwaway key so the timed pass sees fresh draws.
        for b in test_ds.batches(cfg.batch_size_eval):
            x2d = jnp.asarray(b.input_2d)
            x2d_flip = jnp.asarray(
                b.input_2d_flip if b.input_2d_flip is not None else b.input_2d
            )
            warm_key = jax.random.fold_in(key, 0xC0FFEE)
            np.asarray(self.eval_step(self.state.params, warm_key, x2d, x2d_flip))
            break
        for b in test_ds.batches(cfg.batch_size_eval):
            key, sub = jax.random.split(key)
            x2d = jnp.asarray(b.input_2d)
            x2d_flip = jnp.asarray(
                b.input_2d_flip if b.input_2d_flip is not None else b.input_2d
            )
            t0 = time.time()
            pred_norm = self.eval_step(self.state.params, sub, x2d, x2d_flip)
            # np.asarray is a full host transfer: a true device barrier on
            # every backend (block_until_ready is unreliable on relay TPUs).
            # model_time covers device work + the transfer only; the host-side
            # unnormalise happens OUTSIDE the window, matching the reference's
            # model-call-only timing (run.py:575,592-593).
            pred_norm_host = np.asarray(pred_norm)
            model_time += time.time() - t0
            pred = test_ds.reverse_norm_3d_pose(pred_norm_host)

            mask = (b.target_mask & b.row_mask[:, None]).reshape(-1)
            pred_f = pred.reshape(-1, self.num_joints, 3)[mask]
            gt_f = b.gt_3d.reshape(-1, self.num_joints, 3)[mask]
            predictions.append(pred_f)
            k = mask.sum()
            n += k
            e1_sum += float(mpjpe(pred_f[:, None], gt_f[:, None])) * k
            e3_sum += float(n_mpjpe(pred_f[:, None], gt_f[:, None])) * k
            e2_sum += float(p_mpjpe(pred_f, gt_f)) * k
            ev_sum += float(mean_velocity_error(pred_f, gt_f)) * k

        e1, e2, e3, ev = (
            e1_sum / n * unit_scale,
            e2_sum / n * unit_scale,
            e3_sum / n * unit_scale,
            ev_sum / n * unit_scale,
        )
        speed = n / model_time if model_time > 0 else float("inf")
        header = "----------" if action is None else f"----{action}----"
        log.result(
            f"{header}\neval_frame: {n}\ninference_time: {model_time / 60}min\n"
            f"inference_speed: {speed}frame/s\n"
            f"Protocol #1 Error (MPJPE): {e1}mm\n"
            f"Protocol #2 Error (P-MPJPE): {e2}mm\n"
            f"Protocol #3 Error (N-MPJPE): {e3}mm\n"
            f"Velocity Error (MPJVE): {ev}mm\n----------\n"
        )
        return dict(
            e1=e1, e2=e2, e3=e3, ev=ev, n_frames=int(n),
            model_time=model_time, frames_per_sec=speed,
            predictions=np.concatenate(predictions) if predictions else None,
        )
