"""AOT serving export: the flip-TTA DDIM eval step as a self-contained
StableHLO artifact (jax.export).

The reference ships no serving story — its evaluation lives inside the
research script (reference run.py:535-654) and needs the full Python
model stack on the serving host. On TPU the natural production hand-off
is an exported XLA program: trace + lower once, serialize, and any
process with a compatible jax runtime replays it with zero framework
code (the artifact embeds the whole pipeline: DDIM scan, flip-TTA
doubling/average, per-row noise keying). Trained weights stay runtime
INPUTS, so one artifact serves every checkpoint of the same
architecture/shape, and the artifact is portable across hosts of the
same platform (and across platforms listed in ``platforms``).

Typical flow:
    art = export_eval_step(runner, batch_size=4)      # bytes
    open("eval.jaxexport", "wb").write(art)
    # ... serving host ...
    step = restore_eval_step("eval.jaxexport")
    pred_norm = step(params, key, x2d, x2d_flip)      # [B, F_out, J, 3]

CLI front-end: ``python -m diff3dhpe_tpu.cli.export``.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp


def export_eval_step(
    runner,
    batch_size: int,
    *,
    platforms: Optional[Sequence[str]] = None,
    path: Optional[str] = None,
    sharded: bool = False,
) -> bytes:
    """Serialize ``runner``'s evaluation step at a fixed batch shape.

    The exported signature is eval(params, key, input_2d, input_2d_flip)
    -> predicted_3d_norm [B, F_out, J, 3], exactly
    engine.steps.make_eval_step's single-device contract (flip-TTA
    averaged, normalised units — unnormalisation is host-side arithmetic
    and stays out of the artifact). ``platforms`` defaults to the current
    backend; pass e.g. ("tpu",) or ("cpu", "tpu") to pin/widen. Fused
    Pallas paths export fine for the TPU platform (the kernels serialize
    as stablehlo custom calls); cross-platform artifacts need the plain
    flax path (cfg.fast_eval=False).

    ``sharded=True`` exports the runner's mesh-bound step instead (the
    shard_map data-parallel program): the artifact then requires the same
    device count at load time (``jax.export``'s ``nr_devices``) and
    ``batch_size`` must divide the mesh's data axis — multi-chip serving
    with the sharding baked in. Default exports a single-device program.

    Returns the serialized bytes; also writes them to ``path`` if given.
    """
    from diff3dhpe_tpu.engine.steps import make_eval_step

    cfg = runner.cfg
    if sharded:
        mesh = runner.mesh
        data_size = mesh.shape.get("data", 1) if mesh is not None else 1
        if batch_size % max(data_size, 1):
            raise ValueError(
                f"batch_size {batch_size} must divide the mesh data axis "
                f"({data_size}) for a sharded export"
            )
        step = runner.eval_step
    else:
        # A fresh single-device step: the runner's own eval_step may be a
        # shard_map program bound to this host's mesh, which would pin the
        # artifact to an identical mesh at load time.
        step = make_eval_step(
            runner.eval_diffusion, runner.joints_left, runner.joints_right,
            mesh=None, repeat_n=cfg.repeat_n, tta=cfg.test_time_augmentation,
        )

    params = runner.state.params if runner.state is not None else runner.init_params()
    params_spec = jax.tree.map(
        lambda p: jax.ShapeDtypeStruct(p.shape, p.dtype), params
    )
    k = jax.random.PRNGKey(0)
    key_spec = jax.ShapeDtypeStruct(k.shape, k.dtype)
    x_spec = jax.ShapeDtypeStruct(
        (batch_size, cfg.number_of_frames, runner.num_joints, 2), jnp.float32
    )

    kwargs = {} if platforms is None else {"platforms": list(platforms)}
    exported = jax.export.export(step, **kwargs)(
        params_spec, key_spec, x_spec, x_spec
    )
    data = bytes(exported.serialize())
    if path:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)
    return data


def restore_eval_step(artifact: Union[str, bytes, bytearray]):
    """Load an exported eval step (path or bytes) -> callable.

    The callable has the exported signature and runs under jit; inputs
    must match the export-time shapes/dtypes exactly.
    """
    if isinstance(artifact, str):
        with open(artifact, "rb") as f:
            artifact = f.read()
    exported = jax.export.deserialize(bytearray(artifact))
    return exported.call
