"""Typed run configuration.

Key names mirror the reference's configs/*.json ``params`` block plus its
CLI flags (reference: common/arguments.py:13-105 and the JSON merge in
run.py:39-113), so the three shipped reference config files parse unchanged.
The reference's three-stage merge (JSON <- CLI overrides -> flat namespace)
becomes: dataclass defaults <- JSON <- explicit overrides.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Optional


@dataclasses.dataclass
class Config:
    # Run identity / data
    seed: int = 42
    dataset: str = "h36m"
    keypoints: str = "gt"
    model: str = "ConditionalDiffusionMixSTES2SGRANDLinLift"
    subjects_train: str = "S1,S5,S6,S7,S8"
    subjects_test: str = "S9,S11"
    actions: str = "*"
    data_root: str = "data"
    checkpoint: str = "checkpoint"
    checkpoint_frequency: int = 40

    # Training
    epochs: int = 200
    batch_size: int = 64
    batch_size_eval: int = 512
    learning_rate: float = 4e-5
    lr_decay: float = 0.99
    weight_decay: float = 0.1
    patience: int = 200
    max_time: float = 200.0  # hours
    no_eval: bool = False
    export_training_curves: bool = False

    # Windowing
    stride: int = 81
    number_of_frames: int = 81
    out_all: bool = True
    downsample: int = 1
    subset: float = 1.0

    # Diffusion
    beta_schedule: str = "cosine"
    timesteps: int = 1000
    sampling_timesteps: int = 5
    ddim_sampling_eta: float = 0.0
    clip_denoised: bool = True
    clip_loss: bool = True
    loss_type: str = "l2"
    repeat_n: int = 1

    # Model
    transformer_depth: int = 8
    embed_dim: int = 512
    num_heads: int = 8
    mlp_ratio: float = 2.0
    drop_path_rate: float = 0.1
    with_time_emb: bool = True

    # Augmentation / ablation corruption
    data_augmentation: bool = True
    test_time_augmentation: bool = True
    train_extra_noise_std: float = 0.0
    train_val_extra_noise_std: float = 0.0
    test_extra_noise_std: float = 0.0
    train_joint_drop: float = 0.0
    train_val_joint_drop: float = 0.0
    test_joint_drop: float = 0.0

    # TPU execution
    mesh_shape: Optional[str] = None  # e.g. "data:8" or "data:4,model:2"
    matmul_precision: str = "highest"  # "highest" = f32 parity; "default" = bf16 MXU
    compute_dtype: str = "float32"  # "bfloat16" for the fast path
    use_pallas_attention: bool = False
    remat: bool = False  # rematerialise forward in backprop (long-seq training)
    # Remat granularity: "block" = one jax.checkpoint region per
    # transformer block (backward recomputes one block at a time — small
    # working set, the TPU-recommended mode); "whole" = a single
    # checkpoint region over the full forward (round-1 behavior: backward
    # rebuilds every activation at once before backprop).
    remat_mode: str = "block"
    # Fused-kernel inference path (models/fast_eval.py) for the final
    # evaluation; 1.27x over the flax forward on v5e at bf16.
    fast_eval: bool = False
    # Mixed-precision fast eval (meaningful with fast_eval +
    # compute_dtype=bfloat16): run the LAST N DDIM steps through an f32
    # fused forward (the denoiser is contractive near t->0, so one f32
    # finishing step recovers most of the f32 trajectory at ~bf16 speed),
    # and keep the head epilogue (final LN + [C,3] projection) in f32 so
    # the bf16 trunk's x0-estimate is not output-rounded each step.
    # Accuracy-gated in scripts/accuracy_study.py.
    eval_f32_final_steps: int = 0
    eval_f32_head: bool = False
    # f32 contraction mode of those final steps: "high3" (manual bf16x3,
    # 3 MXU passes — the accuracy-study winner fast_mixed1_h3, +0.0005 mm
    # vs the flax f32 path at 16.7 seq/s), "highest" (6-pass exact f32,
    # same accuracy, ~2x the final-step cost), or "default" (single bf16
    # pass, +0.08 mm — fails the 0.5% rel gate). Only the final f32 steps
    # pay the multi-pass cost; the bf16 trunk steps are unaffected.
    eval_final_prec: str = "high3"
    # Precision tail INSIDE the final f32 step(s): 0 = the whole final-step
    # forward runs f32 (round-4 behavior); N>0 = only the last N
    # (spatial, temporal) block pairs + head run f32 (at eval_final_prec),
    # the earlier pairs stay bf16 — cheaper final step at the same gate if
    # the accuracy study admits the tail depth (fast_mixed1_h3_tailK
    # variants).
    eval_f32_tail_pairs: int = 0
    # Fused-kernel TRAINING forward (custom VJP: Pallas forward +
    # XLA-recompute backward, models/fast_eval.py). Gradients match the
    # flax path up to rounding; data-parallel meshes only.
    fast_train: bool = False
    # Backward structure for fast_train: True (default) puts the custom-VJP
    # boundary at each (spatial, temporal) block pair — the backward
    # recomputes one pair at a time from stored boundaries (monolithic
    # FLOPs, flaxblk-like memory, so large per-chip batches don't OOM);
    # False restores the round-3 monolithic recompute backward, which is
    # marginally faster at small per-chip batches (b8 bf16: ~43.4 vs ~42
    # seq/s) but OOMs beyond b8 f32 / b16 bf16 — measured table in PERF.md
    # "Round-5: pair-VJP sweep".
    fast_train_pair_vjp: bool = True
    # Fused attention backward for fast_train: the recompute mirror's
    # attention runs through a custom-VJP pair of Pallas kernels (forward
    # dispatcher + flash-style in-VMEM backward) instead of XLA einsums —
    # no [G, N, N] probability tensors in HBM during the backward.
    # Measured SLOWER than the XLA einsum backward at every completing
    # flagship cell (b8 bf16 40.9 vs 42.0; PERF.md "Round-5: fused
    # GRAND attention backward") — kept opt-in for memory-bound regimes
    # and as the parity-tested kernel seed for other geometries.
    fast_train_attn_bwd: bool = False

    # Checkpointing / eval
    resume: str = ""
    evaluate: str = ""
    pretrained_model: Optional[str] = None
    workers: int = 0  # kept for CLI compat; the numpy pipeline is in-process

    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)

    @property
    def pad(self) -> int:
        return 0 if self.out_all else (self.number_of_frames - 1) // 2


_BOOL_KEYS = {
    "out_all", "data_augmentation", "test_time_augmentation", "clip_denoised",
    "with_time_emb", "clip_loss", "no_eval",
}


def _coerce(key: str, value):
    """Accept the reference's string-typed booleans ('True'/'False')."""
    if key in _BOOL_KEYS and isinstance(value, str):
        return value == "True"
    return value


def load_config(path: Optional[str] = None, overrides: Optional[dict] = None) -> Config:
    """Build a Config from a reference-format JSON file plus overrides.

    ``overrides`` with value None are ignored (matching the reference's
    'CLI flag set only if not None' merge, run.py:50-110).
    """
    cfg = Config()
    fields = {f.name for f in dataclasses.fields(Config)}
    if path:
        with open(path) as f:
            params = json.load(f)["params"]
        known = {k: _coerce(k, v) for k, v in params.items() if k in fields}
        cfg = cfg.replace(**known)
    if overrides:
        known = {
            k: _coerce(k, v) for k, v in overrides.items() if k in fields and v is not None
        }
        cfg = cfg.replace(**known)
    return cfg
