"""Jitted train and eval step factories.

- Train step (reference epoch-loop body, run.py:322-347): one jit with
  donated state — loss = mean(p_losses), AdamW(+per-epoch exponential lr
  decay as a step schedule), gradients all-reduced over the mesh's data
  axis by XLA.
- Eval step (reference evaluate():557-596): flip test-time augmentation is
  fused as a doubled batch through ONE DDIM sampling scan — the reference
  runs the whole sampling loop twice (run.py:577-582); we concatenate
  [x2d; x2d_flip], sample once, un-flip the second half with a static
  joint-permutation gather, and average. Combined with the lax.scan DDIM
  loop this makes an entire evaluation batch a single XLA program.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from diff3dhpe_tpu.diffusion.gaussian_diffusion import GaussianDiffusion


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: dict
    opt_state: optax.OptState


def make_denoise_fn(model, remat: bool = False) -> Callable:
    """Adapt a flax module to the engine's denoise_fn(params, x, t, key).

    ``remat=True`` rematerialises the forward during backprop
    (jax.checkpoint): trades ~1 extra forward of FLOPs for not storing the
    activations of all 2*depth transformer blocks — needed to fit the
    243-frame training config on a single chip's HBM at larger batch.
    """

    def eval_fn(params, x, t):
        return model.apply({"params": params}, x, t, deterministic=True)

    def train_fn(params, x, t, dropout_key):
        return model.apply(
            {"params": params}, x, t, deterministic=False, rngs={"dropout": dropout_key}
        )

    if remat:
        train_fn = jax.checkpoint(train_fn)
        eval_fn = jax.checkpoint(eval_fn)

    def denoise_fn(params, x, t, dropout_key=None):
        if dropout_key is None:
            return eval_fn(params, x, t)
        return train_fn(params, x, t, dropout_key)

    # Explicit marker consumed by make_eval_step's shard_map auto-detection:
    # a flax model built with use_pallas=True lowers to pallas_call, which
    # XLA's SPMD partitioner cannot split.
    denoise_fn.uses_pallas = bool(getattr(model, "use_pallas", False))
    return denoise_fn


def make_fast_denoise_fn(
    num_frame: int,
    num_joints: int,
    depth: int,
    num_heads: int = 8,
    with_time_emb: bool = True,
    mode: str = "s2s",
    dtype=None,
    temporal_mode: str = "rows",
    fuse_time: bool = True,
    f32_head: bool = False,
    f32_prec: str | None = None,
    f32_tail_pairs: int = 0,
) -> Callable:
    """Inference-optimised denoise_fn: the fused-kernel functional forward
    (models/fast_eval.py) over the same param tree. Eval-only (no VJP).
    ``f32_head`` keeps the head epilogue (final LN + [C, 3] projection) in
    f32 so a bf16 trunk's x0-estimate is not output-rounded to bf16.
    ``f32_prec`` pins this callable's f32 contraction mode ("default" /
    "highest" / "high3"), independent of the DIFF_FUSED_F32_PREC env.
    ``f32_tail_pairs`` (bf16 dtype only) runs the last N block pairs + head
    at f32 under that contraction mode (models/fast_eval.py)."""
    import jax.numpy as jnp

    from diff3dhpe_tpu.models.fast_eval import fast_forward_denoise

    dtype = dtype or jnp.bfloat16

    def denoise_fn(params, x, t, dropout_key=None):
        assert dropout_key is None, "fast_eval path is inference-only"
        return fast_forward_denoise(
            params, x, t, num_frame=num_frame, num_joints=num_joints,
            depth=depth, num_heads=num_heads, with_time_emb=with_time_emb,
            mode=mode, dtype=dtype, temporal_mode=temporal_mode,
            fuse_time=fuse_time, f32_head=f32_head, f32_prec=f32_prec,
            f32_tail_pairs=f32_tail_pairs,
        )

    denoise_fn.uses_pallas = True
    return denoise_fn


def make_fast_train_denoise_fn(
    num_frame: int,
    num_joints: int,
    depth: int,
    num_heads: int = 8,
    with_time_emb: bool = True,
    mode: str = "s2s",
    dtype=None,
    drop_path_rate: float = 0.1,
    temporal_mode: str = "rows",
    ckpt_blocks: bool = False,
    pair_vjp: bool = True,
    attn_bwd: bool = False,
) -> Callable:
    """TRAINING denoise_fn on the fused-kernel forward: Pallas forward +
    XLA-recompute backward via custom VJP (models/fast_eval.py
    fast_forward_denoise_train). Drop-path scales are drawn from the
    dropout_key with flax DropPath semantics; with dropout_key=None
    (eval/sampling calls) the fused inference forward runs directly.
    ``pair_vjp`` (default): the custom-VJP boundary sits at each
    (spatial, temporal) block pair, so the backward recomputes one pair at
    a time from stored boundaries — same gradients and FLOPs as the
    monolithic backward with flaxblk-like memory (measured capacity and
    throughput table: PERF.md "Round-5: pair-VJP sweep"; at the b8 bf16
    point the monolithic backward is marginally faster, ~43.4 vs ~42
    seq/s, but OOMs beyond b8 f32 / b16 bf16). ``pair_vjp=False`` restores
    the round-3 monolithic backward; ``ckpt_blocks`` then checkpoints it
    per block (slower: +1 forward of recompute FLOPs). ``attn_bwd`` runs
    the mirror's attention through the flash-style fused backward kernel
    (ops/attention.py::grand_attention_trainable) instead of einsums —
    measured slower at flagship geometry (PERF.md "Round-5: fused GRAND
    attention backward"), kept opt-in."""
    import jax.numpy as jnp

    from diff3dhpe_tpu.models.fast_eval import (
        FastTrainCfg,
        draw_drop_path_scales,
        fast_forward_denoise,
        fast_forward_denoise_train,
        fast_forward_denoise_train_pairs,
    )

    if pair_vjp and ckpt_blocks:
        # ckpt_blocks structures the MONOLITHIC backward only; the pair
        # backward already bounds memory at pair boundaries, so the flag
        # would be silently ignored (round-4 advisor finding).
        import warnings

        warnings.warn(
            "ckpt_blocks has no effect when pair_vjp=True (the pair "
            "backward already recomputes one pair at a time); set "
            "pair_vjp=False to use the per-block-checkpointed monolithic "
            "backward", stacklevel=2,
        )
    dtype = dtype or jnp.float32
    cfg = FastTrainCfg(
        num_frame=num_frame, num_joints=num_joints, depth=depth,
        num_heads=num_heads, with_time_emb=with_time_emb, mode=mode,
        dtype_name="bfloat16" if dtype == jnp.bfloat16 else "float32",
        temporal_mode=temporal_mode, ckpt_blocks=ckpt_blocks,
        attn_bwd=attn_bwd,
    )

    def denoise_fn(params, x, t, dropout_key=None):
        if dropout_key is None:
            return fast_forward_denoise(
                params, x, t, num_frame=num_frame, num_joints=num_joints,
                depth=depth, num_heads=num_heads, with_time_emb=with_time_emb,
                mode=mode, dtype=dtype, temporal_mode=temporal_mode,
            )
        dp = draw_drop_path_scales(
            dropout_key, x.shape[0], depth, drop_path_rate,
            num_frame=num_frame, num_joints=num_joints,
        )
        if pair_vjp:
            return fast_forward_denoise_train_pairs(params, x, t, dp, cfg)
        return fast_forward_denoise_train(params, x, t, dp, cfg)

    denoise_fn.uses_pallas = True
    return denoise_fn


def make_optimizer(
    learning_rate: float,
    lr_decay: float,
    steps_per_epoch: int,
    weight_decay: float = 0.1,
) -> optax.GradientTransformation:
    """AdamW with the reference's per-epoch exponential decay (run.py:502-505)
    expressed as a pure step->lr schedule (so resume restores lr from step)."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return learning_rate * (lr_decay ** epoch)

    return optax.adamw(
        learning_rate=schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
    )


def build_train_state(params, optimizer) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
    )


def make_train_step(
    diffusion: GaussianDiffusion,
    optimizer: optax.GradientTransformation,
    mesh=None,
    donate: bool = True,
):
    """Returns jitted train_step(state, key, gt_3d_norm, input_2d) -> (state, loss).

    On a multi-device mesh the batch shards over the 'data' axis. When the
    diffusion engine's denoiser lowers to Pallas custom calls (the fused
    fast-train path), the loss+grad computation is wrapped in shard_map —
    XLA's SPMD partitioner cannot split a pallas_call — with params
    replicated, per-shard RNG derived from the data-axis index, and
    gradients pmean-reduced over the axis; the optimizer update runs on the
    replicated result. Requires a data-only mesh (no tensor-parallel axis:
    TP shards the params, which the replicated shard_map body cannot see).
    """
    uses_pallas = _uses_pallas(diffusion)
    data_size = 1
    if mesh is not None and "data" in mesh.axis_names:
        data_size = mesh.shape["data"]

    if uses_pallas and mesh is not None and data_size > 1:
        if "model" in mesh.axis_names and mesh.shape["model"] > 1:
            raise NotImplementedError(
                "fast_train shard_map path supports data-parallel meshes only "
                "(the fused Pallas paths replicate params per shard, which a "
                "tensor-parallel mesh would shard). Workarounds: use a "
                "data-only mesh (e.g. mesh_shape='data:8'), or drop "
                "fast_train to train tensor-parallel through the flax path."
            )
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def train_step(state: TrainState, key, gt_3d_norm, input_2d):
            if gt_3d_norm.shape[0] % data_size:
                raise ValueError(
                    f"global batch {gt_3d_norm.shape[0]} does not divide the "
                    f"mesh's data axis ({data_size}); the shard_map fast-train "
                    f"path needs batch_size to be a multiple of the data-axis "
                    f"size — adjust batch_size or the mesh"
                )

            def body(params, gt_l, x2d_l):
                idx = jax.lax.axis_index("data")
                diff_key, dropout_key = jax.random.split(jax.random.fold_in(key, idx))

                def loss_fn(p):
                    return diffusion.training_loss(
                        p, diff_key, gt_l, x2d_l, dropout_key=dropout_key
                    )

                loss, grads = jax.value_and_grad(loss_fn)(params)
                return (
                    jax.lax.pmean(loss, "data"),
                    jax.lax.pmean(grads, "data"),
                )

            loss, grads = shard_map(
                body, mesh=mesh,
                in_specs=(P(), P("data"), P("data")),
                out_specs=(P(), P()),
                check_vma=False,
            )(state.params, gt_3d_norm, input_2d)
            updates, new_opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            new_params = optax.apply_updates(state.params, updates)
            return (
                TrainState(step=state.step + 1, params=new_params, opt_state=new_opt_state),
                loss,
            )

        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    def train_step(state: TrainState, key, gt_3d_norm, input_2d):
        if mesh is not None:
            from diff3dhpe_tpu.parallel.mesh import batch_sharding

            gt_3d_norm = jax.lax.with_sharding_constraint(gt_3d_norm, batch_sharding(mesh))
            input_2d = jax.lax.with_sharding_constraint(input_2d, batch_sharding(mesh))

        diff_key, dropout_key = jax.random.split(key)

        def loss_fn(params):
            return diffusion.training_loss(
                params, diff_key, gt_3d_norm, input_2d, dropout_key=dropout_key
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=new_params, opt_state=new_opt_state),
            loss,
        )

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def flip_pose_jnp(pose, joints_left: Sequence[int], joints_right: Sequence[int]):
    """Negate x and swap left/right joints: [..., J, C] -> [..., J, C]."""
    j = pose.shape[-2]
    perm = np.arange(j)
    perm[list(joints_left) + list(joints_right)] = np.array(
        list(joints_right) + list(joints_left)
    )
    flipped = pose * jnp.array([-1.0] + [1.0] * (pose.shape[-1] - 1), pose.dtype)
    return flipped[..., jnp.asarray(perm), :]


def make_eval_step(
    diffusion: GaussianDiffusion,
    joints_left: Sequence[int],
    joints_right: Sequence[int],
    mesh=None,
    repeat_n: int = 1,
    shard_map_batch: bool = None,
    tta: bool = True,
):
    """Returns jitted eval_step(params, key, input_2d, input_2d_flip)
    -> predicted_3d_norm [B, F_out, J, 3] (flip-TTA averaged).

    ``tta=False`` runs a single (non-doubled) sampling pass and ignores
    input_2d_flip entirely — callers keep the same 4-arg signature. This
    mirrors the reference's test_augmentation=False branch (run.py:577-587
    runs the flip pass only when args.test_time_augmentation).

    Sampling noise is drawn per-row keyed by the row's GLOBAL batch index,
    so predictions are bit-identical between a single device and any mesh
    size (see GaussianDiffusion.ddim_sample_loop).

    On a multi-device mesh the batch is split over the 'data' axis. When the
    diffusion engine contains Pallas kernels, XLA's SPMD partitioner cannot
    split the custom calls, so the per-device computation is wrapped in
    shard_map (params replicated, batch sharded) — ``shard_map_batch=None``
    auto-detects via the ``uses_pallas`` attribute that make_denoise_fn /
    make_fast_denoise_fn set. The batch must then divide the data-axis size.
    """

    jl, jr = list(joints_left), list(joints_right)

    def eval_body(params, key, input_2d, input_2d_flip, row_offset=0, total_rows=None):
        b, f, j, _ = input_2d.shape
        f_out = f if diffusion.mode == "s2s" else 1
        total = b if total_rows is None else total_rows
        idx = row_offset + jnp.arange(b)
        if not tta:
            return diffusion.estimate_pose(
                params, key, input_2d, (b, f_out, j, 3), repeat_n=repeat_n,
                row_index=idx, num_rows=total,
            )
        both = jnp.concatenate([input_2d, input_2d_flip], axis=0)
        both_idx = jnp.concatenate([idx, total + idx])
        pred = diffusion.estimate_pose(
            params, key, both, (2 * b, f_out, j, 3), repeat_n=repeat_n,
            row_index=both_idx, num_rows=2 * total,
        )
        pred_normal, pred_flip = pred[:b], pred[b:]
        pred_flip = flip_pose_jnp(pred_flip, jl, jr)
        return (pred_normal + pred_flip) / 2.0

    data_size = 1
    if mesh is not None and "data" in mesh.axis_names:
        data_size = mesh.shape["data"]

    if mesh is None or data_size <= 1:
        return jax.jit(eval_body, static_argnames=("row_offset", "total_rows"))

    if shard_map_batch is None:
        shard_map_batch = _uses_pallas(diffusion)

    from jax.sharding import PartitionSpec as P

    if shard_map_batch:
        from jax import shard_map

        def eval_step(params, key, input_2d, input_2d_flip):
            total = input_2d.shape[0]
            if total % data_size:
                raise ValueError(
                    f"eval batch {total} does not divide the mesh's data axis "
                    f"({data_size}); the shard_map eval path would silently "
                    f"drop rows — adjust batch_size_eval or the mesh"
                )
            local_b = total // data_size

            def body_fn(p, x, xf):
                offset = jax.lax.axis_index("data") * local_b
                return eval_body(p, key, x, xf, row_offset=offset, total_rows=total)

            body = shard_map(
                body_fn,
                mesh=mesh,
                in_specs=(P(), P("data"), P("data")),
                out_specs=P("data"),
                check_vma=False,
            )
            return body(params, input_2d, input_2d_flip)

        return jax.jit(eval_step)

    def eval_step(params, key, input_2d, input_2d_flip):
        from diff3dhpe_tpu.parallel.mesh import batch_sharding

        input_2d = jax.lax.with_sharding_constraint(input_2d, batch_sharding(mesh))
        input_2d_flip = jax.lax.with_sharding_constraint(
            input_2d_flip, batch_sharding(mesh)
        )
        return eval_body(params, key, input_2d, input_2d_flip)

    return jax.jit(eval_step)


def _uses_pallas(diffusion: GaussianDiffusion) -> bool:
    """Whether the engine's denoiser lowers to Pallas custom calls — read
    from the explicit ``uses_pallas`` attribute stamped by make_denoise_fn
    (flax model with use_pallas=True) and make_fast_denoise_fn (always)."""
    return bool(getattr(diffusion.denoise_fn, "uses_pallas", False))


def make_val_step(
    diffusion: GaussianDiffusion,
    joints_left: Sequence[int],
    joints_right: Sequence[int],
    mesh=None,
    sample_diffusion: GaussianDiffusion = None,
    tta: bool = True,
):
    """End-of-epoch validation (reference run.py:364-403): flip-TTA prediction
    plus the averaged p_losses of both orientations (single orientation when
    ``tta=False``). Returns jitted
    val_step(params, key, gt_3d_norm, input_2d, input_2d_flip) ->
    (pred_norm, loss). ``sample_diffusion`` optionally provides a faster
    engine (e.g. the fused fast-eval path) for the DDIM sampling while
    p_losses stays on ``diffusion``."""
    jl, jr = list(joints_left), list(joints_right)
    eval_step = make_eval_step(
        sample_diffusion or diffusion, jl, jr, mesh=mesh, tta=tta
    )

    def val_step(params, key, gt_3d_norm, input_2d, input_2d_flip):
        key_pred, key_l1, key_l2 = jax.random.split(key, 3)
        pred = eval_step(params, key_pred, input_2d, input_2d_flip)
        loss = jnp.mean(diffusion.p_losses(params, key_l1, gt_3d_norm, input_2d))
        if tta:
            gt_flip = flip_pose_jnp(gt_3d_norm, jl, jr)
            loss = 0.5 * (
                loss
                + jnp.mean(diffusion.p_losses(params, key_l2, gt_flip, input_2d_flip))
            )
        return pred, loss

    return jax.jit(val_step)
