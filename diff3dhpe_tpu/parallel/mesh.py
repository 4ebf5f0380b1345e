"""Device mesh construction and sharding rules.

The distributed backbone (replacing the reference's single-process
nn.DataParallel replica split, reference run.py:216-218) is a named
jax.sharding.Mesh with two axes:

- ``data``: batch sharding — every train/eval batch is split across this
  axis; gradients are all-reduced over ICI by XLA automatically.
- ``model``: optional tensor parallelism — attention qkv/proj and MLP
  fc1/fc2 kernels are sharded head-/hidden-wise, giving Megatron-style
  column->row parallel pairs. XLA's SPMD partitioner inserts the single
  all-reduce per pair. For this ~33M-parameter model TP is a scaling
  demonstration more than a necessity; the default mesh is pure data
  parallel.

The same program runs on 1 chip (tests, the tunnel), a v5e-8 slice, or a
virtual 8-device CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(spec: Optional[str] = None, devices=None) -> Mesh:
    """Build a mesh from a "axis:size,axis:size" spec; default all-data.

    Example: make_mesh("data:4,model:2").
    """
    if devices is None:
        devices = jax.devices()
    if not spec:
        return Mesh(np.array(devices), ("data",))
    names, sizes = [], []
    for part in spec.split(","):
        name, size = part.split(":")
        names.append(name.strip())
        sizes.append(int(size))
    total = int(np.prod(sizes))
    assert total <= len(devices), f"mesh {spec} needs {total} devices, have {len(devices)}"
    arr = np.array(devices[:total]).reshape(sizes)
    return Mesh(arr, tuple(names))


def _has_axis(mesh: Mesh, axis: str) -> bool:
    return axis in mesh.axis_names and mesh.shape[axis] > 1


def param_sharding_rules(path_tuple, leaf, mesh: Mesh) -> P:
    """PartitionSpec for one MixSTE parameter.

    Tensor-parallel layout (only when the mesh has a >1 'model' axis):
    column-parallel qkv / mlp.fc1 (output-dim sharded), row-parallel
    attn.proj / mlp.fc2 (input-dim sharded). Everything else replicated.
    """
    if not _has_axis(mesh, "model"):
        return P()
    names = [str(p) for p in path_tuple]
    joined = "/".join(names)
    is_kernel = names[-1] == "kernel"
    is_bias = names[-1] == "bias"
    if ("qkv" in joined or "fc1" in joined) and is_kernel:
        return P(None, "model")
    if ("qkv" in joined or "fc1" in joined) and is_bias:
        return P("model")
    if ("proj" in joined or "fc2" in joined) and is_kernel and "time_proj" not in joined:
        return P("model", None)
    return P()


def shard_params(params, mesh: Mesh):
    """Device-put a param pytree with the TP/replication layout."""

    def place(path, leaf):
        spec = param_sharding_rules(tuple(k.key for k in path), leaf, mesh)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params, mesh: Mesh):
    """The NamedSharding pytree matching shard_params' placement."""

    def spec(path, leaf):
        return NamedSharding(mesh, param_sharding_rules(tuple(k.key for k in path), leaf, mesh))

    return jax.tree_util.tree_map_with_path(spec, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
