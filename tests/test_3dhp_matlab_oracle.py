"""Independent numpy oracle for the 3DHP PCK/AUC protocol (VERDICT r3 #6).

The reference delegates PCK@150/AUC to P-STMO's MATLAB script
`mpii_test_predictions_py.m` (reference data/README.MD, run_3dhp.py's
inference_data.mat export); no MATLAB exists in this image and real 3DHP
data is absent, so the published 99.1/84.8 cross-check is pending. What CAN
be locked down now is the protocol semantics our in-framework numbers rely
on. This module re-implements the MATLAB pipeline's structure verbatim-by
-description — per-sequence frame loop, per-joint distance, valid-frame
masking, explicit per-joint-then-mean averaging, inclusive 0:5:150 grid —
as an INDEPENDENT code path (scalar loops, no shared helpers), and checks
`metrics.pck`/`metrics.auc` against it on randomized inputs.

Protocol facts encoded (MPI-INF-3DHP test_util / P-STMO conventions):
- all 17 provided joints are evaluated (the test-set annot_data.mat is
  already the 17-joint subset of the full 28);
- only frames with valid_frame == 1 count;
- distances in mm on root-relative poses;
- PCK = % of (frame, joint) pairs with distance <= 150 mm;
- AUC = mean PCK over thresholds 0,5,...,150 (31 points, inclusive ends);
- the headline "total" pools ALL valid frames of all sequences
  (cli/run_3dhp.py concatenates before calling pck/auc).
"""
import numpy as np
import pytest

from diff3dhpe_tpu.metrics import auc as auc_vec
from diff3dhpe_tpu.metrics import pck as pck_vec


def oracle_per_joint_pck_curve(pred_seq, gt_seq, valid, thresholds):
    """[T, J] curve: per-joint fraction of VALID frames within each
    threshold — the mpii_evaluate_errors aggregation unit (one PCK value
    per joint per threshold), written as explicit Python loops."""
    n, j, _ = pred_seq.shape
    t_count = len(thresholds)
    within = np.zeros((t_count, j), dtype=np.float64)
    n_valid = 0
    for f in range(n):
        if not valid[f]:
            continue
        n_valid += 1
        for jj in range(j):
            d = 0.0
            for c in range(3):
                d += (pred_seq[f, jj, c] - gt_seq[f, jj, c]) ** 2
            d = d ** 0.5
            for ti, th in enumerate(thresholds):
                if d <= th:
                    within[ti, jj] += 1.0
    assert n_valid > 0
    return within / n_valid


def oracle_pck_auc(seq_preds, seq_gts, seq_valids):
    """MATLAB-pipeline-shaped evaluation over a list of sequences.

    Returns (total_pck, total_auc, per_seq) where totals pool all valid
    frames across sequences (each sequence weighted by its valid-frame
    count) and per_seq holds each sequence's own PCK/AUC.
    """
    thresholds = [5.0 * i for i in range(31)]  # 0:5:150 inclusive
    assert thresholds[0] == 0.0 and thresholds[-1] == 150.0
    per_seq = []
    weighted_curve = None
    total_valid = 0
    for pred, gt, valid in zip(seq_preds, seq_gts, seq_valids):
        curve = oracle_per_joint_pck_curve(pred, gt, valid, thresholds)
        n_valid = int(np.sum(valid))
        seq_pck = 100.0 * float(np.mean(curve[-1]))  # threshold 150
        seq_auc = 100.0 * float(np.mean(curve))  # mean over grid and joints
        per_seq.append((seq_pck, seq_auc))
        contrib = curve * n_valid
        weighted_curve = contrib if weighted_curve is None else weighted_curve + contrib
        total_valid += n_valid
    total_curve = weighted_curve / total_valid
    return (
        100.0 * float(np.mean(total_curve[-1])),
        100.0 * float(np.mean(total_curve)),
        per_seq,
    )


def _random_sequences(rng, n_seqs=3, joints=17):
    seqs = []
    for _ in range(n_seqs):
        n = int(rng.integers(6, 15))
        gt = rng.standard_normal((n, joints, 3)) * 120.0
        # Errors spanning the whole 0..150+ mm range so every threshold bin
        # is exercised.
        noise = rng.standard_normal((n, joints, 3)) * rng.uniform(10.0, 90.0)
        pred = gt + noise
        valid = rng.random(n) > 0.25
        if not valid.any():
            valid[0] = True
        seqs.append((pred, gt, valid))
    return seqs


def test_metrics_match_matlab_shaped_oracle(rng):
    """Pooled-total PCK/AUC from metrics.pck/auc on the concatenated valid
    frames (exactly what cli/run_3dhp.py computes) equals the per-sequence
    MATLAB-pipeline oracle."""
    for trial in range(3):
        seqs = _random_sequences(np.random.default_rng(100 + trial))
        o_pck, o_auc, _ = oracle_pck_auc(*zip(*seqs))
        pred_cat = np.concatenate([p[v] for p, _, v in seqs])
        gt_cat = np.concatenate([g[v] for _, g, v in seqs])
        np.testing.assert_allclose(pck_vec(pred_cat, gt_cat), o_pck, atol=1e-9)
        np.testing.assert_allclose(auc_vec(pred_cat, gt_cat), o_auc, atol=1e-9)


def test_valid_mask_kwarg_matches_oracle_masking(rng):
    """metrics.pck/auc valid_mask semantics == the oracle's valid-frame
    skip (per-frame masking before any averaging)."""
    pred, gt, valid = _random_sequences(np.random.default_rng(7), n_seqs=1)[0]
    o_pck, o_auc, _ = oracle_pck_auc([pred], [gt], [valid])
    np.testing.assert_allclose(
        pck_vec(pred, gt, valid_mask=valid), o_pck, atol=1e-9
    )
    np.testing.assert_allclose(
        auc_vec(pred, gt, valid_mask=valid), o_auc, atol=1e-9
    )


def test_auc_grid_is_inclusive_31_points():
    """AUC grid must be 0:5:150 INCLUSIVE (31 points): a prediction exactly
    150 mm off counts in one grid point only (the 150 bin), giving
    AUC = 100/31 %; one exactly right counts everywhere (100%)."""
    gt = np.zeros((1, 1, 3))
    at_150 = np.array([[[150.0, 0.0, 0.0]]])
    np.testing.assert_allclose(auc_vec(at_150, gt), 100.0 / 31.0, atol=1e-9)
    np.testing.assert_allclose(auc_vec(gt, gt), 100.0, atol=1e-12)
    # PCK threshold is inclusive too (<= 150).
    np.testing.assert_allclose(pck_vec(at_150, gt), 100.0, atol=1e-12)
    just_over = np.array([[[150.0001, 0.0, 0.0]]])
    np.testing.assert_allclose(pck_vec(just_over, gt), 0.0, atol=1e-12)


def test_sequencewise_average_vs_pooled_differ_when_unbalanced():
    """Documented distinction: per-sequence averaging and pooled-frames
    aggregation are DIFFERENT statistics when sequences have unequal valid
    counts — the headline total pools frames (sequences weighted by valid
    frames), while the sequence-wise table averages per sequence. Guards
    against silently swapping one for the other."""
    rng = np.random.default_rng(3)
    # seq A: 2 valid frames, terrible; seq B: 40 valid frames, perfect.
    gt_a = rng.standard_normal((2, 17, 3)) * 100
    pred_a = gt_a + 400.0  # all joints far outside 150 mm
    gt_b = rng.standard_normal((40, 17, 3)) * 100
    seqs = [
        (pred_a, gt_a, np.ones(2, bool)),
        (gt_b.copy(), gt_b, np.ones(40, bool)),
    ]
    total_pck, _, per_seq = oracle_pck_auc(*zip(*seqs))
    seq_avg_pck = np.mean([s[0] for s in per_seq])
    np.testing.assert_allclose(total_pck, 100.0 * 40 / 42, atol=1e-9)
    np.testing.assert_allclose(seq_avg_pck, 50.0, atol=1e-9)
    assert abs(total_pck - seq_avg_pck) > 40.0
