"""Device synchronisation that works on every backend.

``jax.block_until_ready`` is a no-op on the remote-relay TPU backend used in
some environments (execution is acknowledged before it completes), which
silently breaks wall-clock timing. A scalar reduce + host transfer is the
reliable barrier: the transferred value cannot exist before the computation
producing it has finished.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_sum = jax.jit(lambda a: jnp.sum(jnp.asarray(a, jnp.float32)))


def device_sync(x) -> float:
    """Force completion of the computation producing ``x`` (any pytree);
    returns a scalar derived from it (useful to keep XLA honest)."""
    leaves = jax.tree.leaves(x)
    if not leaves:
        return 0.0
    return float(_sum(leaves[0].reshape(-1)[:1]))
