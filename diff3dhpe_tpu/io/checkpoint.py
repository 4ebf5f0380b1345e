"""Checkpoint save/restore.

Replaces the reference's torch.save dict-of-everything (reference
run.py:446-479: epoch, best_epoch, min_loss, lr, the data-RNG state, the
optimizer and model state) with:
- orbax for the device pytrees (params + optimizer state + step), and
- a JSON sidecar for host metadata (epoch counters, best metrics, the data
  shuffle-RNG state), so resume restores the exact training trajectory.

Also provides the torch-.bin loader used to validate parity against the
reference's released checkpoints (DataParallel 'module.' prefixes and
schedule buffers are handled by torch_convert; schedule buffers are always
recomputed, mirroring the reference's own skip of 'alphas' buffers at load,
run.py:226-235).
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from diff3dhpe_tpu.io.torch_convert import convert_torch_state_dict


def _meta_path(path: str) -> str:
    return os.path.join(path, "meta.json")


def save_checkpoint(path: str, state, meta: dict) -> None:
    """Save TrainState pytree + host metadata under ``path``."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "state"), jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    with open(_meta_path(path), "w") as f:
        json.dump(meta, f, default=_json_default)


def restore_checkpoint(path: str, target_state):
    """Restore (state, meta) from ``path``; target_state supplies structure."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.join(path, "state"), target=jax.device_get(target_state))
    with open(_meta_path(path)) as f:
        meta = json.load(f)
    return state, meta


def _json_default(o: Any):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"not JSON serializable: {type(o)}")


def rng_state_to_json(rng: np.random.Generator) -> dict:
    state = rng.bit_generator.state
    return json.loads(json.dumps(state, default=_json_default))


def rng_state_from_json(state: dict) -> np.random.Generator:
    rng = np.random.default_rng()
    # numpy accepts the state dict back verbatim (keys: bit_generator, state, ...)
    fixed = dict(state)
    if isinstance(fixed.get("state"), dict) and isinstance(fixed["state"].get("key"), list):
        fixed["state"] = dict(fixed["state"])
        fixed["state"]["key"] = np.array(fixed["state"]["key"], dtype=np.uint64)
    rng.bit_generator.state = fixed
    return rng


def load_torch_model_params(
    path: str,
    depth: int,
    with_time_emb: bool = True,
    mode: str = "s2s",
) -> dict:
    """Load a reference .bin checkpoint and convert the denoiser weights."""
    import torch

    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = checkpoint.get("model_diffusion", checkpoint)
    return convert_torch_state_dict(
        state_dict, depth=depth, with_time_emb=with_time_emb, mode=mode
    )
