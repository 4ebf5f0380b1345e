"""Metric tests vs torch/numpy reference formulas (reference: common/loss.py)."""
import numpy as np
import pytest

from diff3dhpe_tpu.metrics import (
    mpjpe,
    n_mpjpe,
    p_mpjpe,
    mean_velocity_error,
    mean_velocity_error_train,
    pck,
    auc,
)

torch = pytest.importorskip("torch")


def test_mpjpe_zero_for_identical(rng):
    x = rng.standard_normal((8, 17, 3))
    assert mpjpe(x, x) == 0.0


def test_mpjpe_matches_torch(rng):
    a = rng.standard_normal((4, 2, 17, 3)).astype(np.float32)
    b = rng.standard_normal((4, 2, 17, 3)).astype(np.float32)
    ours = mpjpe(a, b)
    theirs = torch.mean(
        torch.norm(torch.from_numpy(a) - torch.from_numpy(b), dim=3)
    ).item()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_mpjpe_known_value():
    a = np.zeros((1, 1, 3))
    b = np.array([[[3.0, 4.0, 0.0]]])
    assert mpjpe(a, b) == 5.0


def test_n_mpjpe_scale_invariance(rng):
    target = rng.standard_normal((2, 1, 17, 3))
    pred = target * 3.7  # pure scale error is fully recovered by protocol #3
    np.testing.assert_allclose(n_mpjpe(pred, target), 0.0, atol=1e-12)


def test_n_mpjpe_matches_torch_impl(rng):
    pred = rng.standard_normal((3, 2, 17, 3)).astype(np.float32)
    target = rng.standard_normal((3, 2, 17, 3)).astype(np.float32)
    tp, tt = torch.from_numpy(pred), torch.from_numpy(target)
    norm_predicted = torch.mean(torch.sum(tp ** 2, dim=3, keepdim=True), dim=2, keepdim=True)
    norm_target = torch.mean(torch.sum(tt * tp, dim=3, keepdim=True), dim=2, keepdim=True)
    scale = norm_target / norm_predicted
    theirs = torch.mean(torch.norm(scale * tp - tt, dim=3)).item()
    np.testing.assert_allclose(n_mpjpe(pred, target), theirs, rtol=1e-5)


def test_p_mpjpe_invariant_to_rigid_transform(rng):
    target = rng.standard_normal((5, 17, 3))
    # Random rotation via QR.
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    pred = 1.3 * target @ q.T + np.array([0.1, -2.0, 0.5])
    assert p_mpjpe(pred, target) < 1e-9


def test_p_mpjpe_leq_mpjpe(rng):
    pred = rng.standard_normal((5, 17, 3))
    target = rng.standard_normal((5, 17, 3))
    assert p_mpjpe(pred, target) <= mpjpe(pred, target) + 1e-9


def test_velocity_error(rng):
    pred = rng.standard_normal((6, 17, 3))
    target = rng.standard_normal((6, 17, 3))
    expected = np.mean(
        np.linalg.norm(np.diff(pred, axis=0) - np.diff(target, axis=0), axis=-1)
    )
    np.testing.assert_allclose(mean_velocity_error(pred, target), expected)
    # constant offset has zero velocity error
    np.testing.assert_allclose(mean_velocity_error(target + 1.0, target), 0.0, atol=1e-12)


def test_velocity_error_train(rng):
    pred = rng.standard_normal((2, 6, 17, 3))
    target = rng.standard_normal((2, 6, 17, 3))
    out = mean_velocity_error_train(pred, target, axis=1)
    expected = np.mean(
        np.linalg.norm(np.diff(pred, axis=1) - np.diff(target, axis=1), axis=-1)
    )
    np.testing.assert_allclose(out, expected)


def test_pck_auc():
    target = np.zeros((4, 17, 3))
    pred = np.zeros((4, 17, 3))
    assert pck(pred, target) == 100.0
    assert auc(pred, target) == pytest.approx(100.0)

    pred2 = pred.copy()
    pred2[..., 0] = 200.0  # all joints 200mm off -> 0% PCK@150
    assert pck(pred2, target) == 0.0
    assert auc(pred2, target) == 0.0

    pred3 = pred.copy()
    pred3[:2, ..., 0] = 200.0  # half the poses wrong
    assert pck(pred3, target) == 50.0

    # 100mm error: inside PCK@150 but fails thresholds < 100 -> AUC picks it up.
    pred4 = pred.copy()
    pred4[..., 0] = 100.0
    assert pck(pred4, target) == 100.0
    expected_auc = 100.0 * np.mean(np.arange(0, 151, 5) >= 100.0)
    assert auc(pred4, target) == pytest.approx(expected_auc)


def test_pck_valid_mask():
    target = np.zeros((4, 17, 3))
    pred = np.zeros((4, 17, 3))
    pred[0, :, 0] = 500.0
    mask = np.array([False, True, True, True])
    assert pck(pred, target, valid_mask=mask) == 100.0
    assert pck(pred, target) == 75.0


def test_p_mpjpe_device_matches_host(rng):
    import jax

    from diff3dhpe_tpu.metrics.metrics import p_mpjpe_device

    pred = rng.standard_normal((6, 17, 3)).astype(np.float32)
    target = rng.standard_normal((6, 17, 3)).astype(np.float32)
    host = p_mpjpe(pred, target)
    dev = float(jax.jit(p_mpjpe_device)(pred, target))
    np.testing.assert_allclose(dev, host, rtol=1e-4)


def test_profiling_utilities():
    import jax.numpy as jnp

    from diff3dhpe_tpu.utils.profiling import clever_format, flops_of, param_count

    assert clever_format(1234.0) == "1.2K"
    assert clever_format(33_600_000.0) == "33.6M"
    assert clever_format(None) == "n/a"
    params = {"a": np.zeros((10, 20)), "b": {"c": np.zeros(5)}}
    assert param_count(params) == 205
    f = flops_of(lambda x, y: x @ y, jnp.zeros((8, 16)), jnp.zeros((16, 4)))
    if f is not None:  # backend-dependent availability
        assert f > 0


def test_analytic_denoiser_flops_vs_xla():
    """denoiser_matmul_flops (the MFU basis in bench.py/train_bench.py)
    cross-checked against XLA's compiled cost analysis on a tiny config:
    the analytic count covers matmuls+attention only, so it must land
    below XLA's total but within ~35% (GEMMs dominate even at this size)."""
    import jax
    import jax.numpy as jnp

    from diff3dhpe_tpu.models import MixSTEDenoiser
    from diff3dhpe_tpu.utils.profiling import denoiser_matmul_flops, flops_of

    F, J, C, depth = 9, 17, 64, 2
    model = MixSTEDenoiser(
        num_frame=F, num_joints=J, in_chans=2, embed_dim=C, depth=depth,
        num_heads=8, mlp_ratio=2.0, qkv_bias=True, with_time_emb=True,
        mode="s2s",
    )
    x = jnp.zeros((1, F, J, 5))
    t = jnp.zeros((1,))
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    xla = flops_of(
        lambda p, x, t: model.apply({"params": p}, x, t, deterministic=True),
        params, x, t,
    )
    analytic = denoiser_matmul_flops(F, J, C, depth)
    if xla is not None and xla > 0:
        assert analytic <= xla * 1.001
        assert analytic >= 0.65 * xla


def test_pck_auc_golden_fixture():
    """Hand-computed golden values pinning the MATLAB-evaluator semantics
    (threshold protocol referenced at run_3dhp.py:631-632): inclusive
    threshold edge, equal weighting over (valid frame, joint) pairs, AUC =
    mean PCK over thresholds 0,5,...,150 (31 points)."""
    # 3 frames x 2 joints with exact distances:
    #   frame0: [0, 150]       both count at threshold 150 (inclusive edge)
    #   frame1: [150.1, 75]    first misses, second hits
    #   frame2: [1000, 1000]   masked out as an invalid frame
    target = np.zeros((3, 2, 3))
    pred = np.zeros((3, 2, 3))
    pred[0, 1, 0] = 150.0
    pred[1, 0, 0] = 150.1
    pred[1, 1, 0] = 75.0
    pred[2, :, 0] = 1000.0
    mask = np.array([True, True, False])

    # valid (frame, joint) hits at 150mm: {(0,0), (0,1), (1,1)} of 4 -> 75%
    assert pck(pred, target, valid_mask=mask) == pytest.approx(75.0)
    # without the mask frame2 contributes two misses -> 3/6 = 50%
    assert pck(pred, target) == pytest.approx(50.0)

    # AUC, single joint at exactly 50mm: hit for thresholds 50..150
    # -> 21 of the 31 thresholds -> 100 * 21/31.
    t1 = np.zeros((1, 1, 3))
    p1 = np.zeros((1, 1, 3))
    p1[0, 0, 0] = 50.0
    assert auc(p1, t1) == pytest.approx(100.0 * 21.0 / 31.0)

    # AUC golden for the fixture above (masked): per-threshold hit counts
    # over the 4 valid pairs, computed by hand from distances {0,150,150.1,75}.
    dists = np.array([0.0, 150.0, 150.1, 75.0])
    expected = 100.0 * np.mean(
        [(dists <= th).mean() for th in np.arange(0, 151, 5)]
    )
    assert auc(pred, target, valid_mask=mask) == pytest.approx(expected)


def test_accuracy_gate_rule():
    """The bench-default gate (scripts/accuracy_study.py::compute_gate) is
    a BOTH-budgets rule: absolute test-MPJPE delta <= 0.1 mm AND relative
    delta <= 0.5% of the parity baseline, so it stays meaningful at any
    operating point (at a 954 mm near-chance baseline the relative budget
    is the binding one; at 20 mm the absolute one)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from accuracy_study import compute_gate

    # 30 mm operating point: rel budget = 0.15 mm, abs budget = 0.1 mm.
    results = {
        "flax_f32": {"e1": 30.0},
        "inside_both": {"e1": 30.05},
        "abs_fail": {"e1": 30.12},      # 0.12 > 0.1 abs even though < 0.15 rel
        "both_fail": {"e1": 30.5},
    }
    gate = compute_gate(results, 30.0)
    assert "flax_f32" not in gate
    assert gate["inside_both"]["passes"]
    assert not gate["abs_fail"]["passes"] and gate["abs_fail"]["passes_rel"]
    assert not gate["both_fail"]["passes_abs"] and not gate["both_fail"]["passes_rel"]

    # 954 mm near-chance baseline: the same 0.5 mm delta that FAILS the
    # absolute budget would pass a purely relative rule — both must hold.
    gate_hi = compute_gate({"flax_f32": {"e1": 954.0}, "p": {"e1": 954.5}}, 954.0)
    assert gate_hi["p"]["passes_rel"] and not gate_hi["p"]["passes"]

    # Multi-hypothesis variants run at a DIFFERENT operating point (they
    # are supposed to move MPJPE) — excluded from the parity gate.
    gate_rep = compute_gate(
        {"flax_f32": {"e1": 30.0}, "fast_f32_rep4": {"e1": 29.0}}, 30.0
    )
    assert "fast_f32_rep4" not in gate_rep


def test_accuracy_gate_all_metrics():
    """Round-5 gate extension (VERDICT r4 Weak #2): the gate covers all
    four protocol metrics (e1/e2/e3/ev, reference run.py:602-614), each
    against its OWN baseline — a path whose MPJPE is inside budget but
    whose velocity error (ev) drifts (the bf16-pure failure mode: ev
    3.244 vs 1.327 mm) must FAIL overall."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from accuracy_study import compute_gate

    base = {"e1": 10.0, "e2": 8.0, "e3": 9.5, "ev": 1.3}
    results = {
        "flax_f32": base,
        # inside budget on every metric
        "good": {"e1": 10.01, "e2": 8.01, "e3": 9.49, "ev": 1.301},
        # e1 fine, ev blown (the bf16-pure failure mode)
        "ev_blown": {"e1": 10.01, "e2": 8.01, "e3": 9.5, "ev": 3.2},
        # e2 outside its own rel budget (0.5% of 8.0 = 0.04)
        "e2_fail": {"e1": 10.0, "e2": 8.05, "e3": 9.5, "ev": 1.3},
    }
    gate = compute_gate(results, base)
    assert gate["good"]["passes"] and gate["good"]["passes_all"]
    assert all(m["passes"] for m in gate["good"]["metrics"].values())
    assert len(gate["good"]["metrics"]) == 4

    assert not gate["ev_blown"]["passes"]
    assert gate["ev_blown"]["passes_e1"]          # e1 alone was inside
    assert not gate["ev_blown"]["metrics"]["ev"]["passes"]

    assert not gate["e2_fail"]["passes"]
    assert not gate["e2_fail"]["metrics"]["e2"]["passes_rel"]

    # Top level keeps the e1 fields (artifact back-compat).
    assert gate["good"]["delta_mm"] == round(0.01, 5)
