"""Profiling and cost accounting.

Replaces the reference's thop params/FLOPs printout (reference
run.py:191-200) with XLA's own compiled cost analysis, and wraps
jax.profiler tracing for on-TPU timeline capture.
"""
from __future__ import annotations

import contextlib
from typing import Callable, Optional

import jax
import numpy as np


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def denoiser_matmul_flops(
    frames: int,
    joints: int = 17,
    embed: int = 512,
    depth: int = 8,
    mlp_ratio: float = 2.0,
    in_chans: int = 2,
) -> float:
    """Matmul+attention FLOPs of ONE MixSTE denoiser forward on one
    sequence (batch row), from the architecture constants — the analytic
    basis for MFU / roofline numbers in bench.py and scripts/train_bench.py
    (reference architecture: model_..._s2s_grand_linLift.py:139-257; each
    depth has a spatial + a temporal transformer block).
    """
    L = frames * joints
    C = embed
    H = int(mlp_ratio * C)
    per_token_gemms = 2 * C * (3 * C) + 2 * C * C + 2 * C * H + 2 * H * C
    block = L * per_token_gemms
    attn = lambda n: 2 * 2 * L * n * C  # QK^T + AV per token group
    total = 0.0
    total += L * 2 * (in_chans + 3) * C  # fusion layer
    total += depth * (2 * block + attn(joints) + attn(frames))
    total += L * 2 * C * 3  # head
    return float(total)


def flops_of(fn: Callable, *example_args) -> Optional[float]:
    """FLOPs of one call of ``fn`` from XLA's compiled cost analysis.

    Returns None if the backend does not expose cost analysis.
    """
    try:
        compiled = jax.jit(fn).lower(*example_args).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:
        return None


def clever_format(value: float) -> str:
    """Human-readable count (reference uses thop.clever_format)."""
    if value is None or value != value:
        return "n/a"
    for unit in ("", "K", "M", "G", "T", "P"):
        if abs(value) < 1000:
            return f"{value:.1f}{unit}"
        value /= 1000
    return f"{value:.1f}E"


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
