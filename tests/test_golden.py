"""Golden regression fixtures: tiny-model outputs frozen at round 1.

Catches unintended numerical drift in the model/diffusion stack in future
rounds even without the reference tree mounted. Regenerate intentionally
with tests/make_golden.py when a change is SUPPOSED to alter numerics.
"""
import os

import numpy as np
import pytest

from make_golden import GOLDEN, compute


@pytest.mark.skipif(
    not os.path.isfile(os.path.join(GOLDEN, "tiny_model_v1.npz")),
    reason="golden fixtures not generated",
)
def test_golden_outputs_stable():
    golden = np.load(os.path.join(GOLDEN, "tiny_model_v1.npz"))
    current = compute()
    for key in ("forward", "ddim_sample", "p_losses"):
        np.testing.assert_allclose(
            current[key], golden[key], rtol=1e-5, atol=1e-6,
            err_msg=f"golden mismatch: {key}",
        )
