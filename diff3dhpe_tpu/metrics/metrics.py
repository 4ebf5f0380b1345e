"""Evaluation metrics: Protocols #1/#2/#3, velocity error, and 3DHP PCK/AUC.

Device-friendly metrics (mpjpe / n_mpjpe / velocity) are written against the
NumPy API and run under jax.numpy when handed jnp arrays. The Procrustes
metric (p_mpjpe) needs a batched SVD; we keep it on host NumPy like the
reference does (reference: common/loss.py:15-142). PCK/AUC reimplement the
reference's external MATLAB 3DHP evaluator in-framework (reference:
run_*_3dhp.py:631-632 exports inference_data.mat for mpii_test_predictions.m;
standard protocol: PCK@150mm and AUC over thresholds 0..150mm step 5).
"""
from __future__ import annotations

import numpy as np


def _norm(x, axis, xp):
    return xp.sqrt(xp.sum(x * x, axis=axis))


def mpjpe(predicted, target, reduce="mean", xp=np):
    """Protocol #1: mean per-joint position error (Euclidean distance)."""
    assert predicted.shape == target.shape
    per_joint = _norm(predicted - target, axis=-1, xp=xp)
    if reduce == "mean":
        return xp.mean(per_joint)
    elif reduce == "none":
        return xp.mean(per_joint, axis=-1)
    raise ValueError(f"Unknown reduce method: {reduce}")


def weighted_mpjpe(predicted, target, w, reduce="mean", xp=np):
    assert predicted.shape == target.shape
    per_joint = w * _norm(predicted - target, axis=-1, xp=xp)
    if reduce == "mean":
        return xp.mean(per_joint)
    elif reduce == "none":
        return xp.mean(per_joint, axis=-1)
    raise ValueError(f"Unknown reduce method: {reduce}")


def n_mpjpe(predicted, target, xp=np):
    """Protocol #3: MPJPE after optimal per-pose scale alignment."""
    assert predicted.shape == target.shape
    norm_predicted = xp.mean(
        xp.sum(predicted ** 2, axis=3, keepdims=True), axis=2, keepdims=True
    )
    norm_target = xp.mean(
        xp.sum(target * predicted, axis=3, keepdims=True), axis=2, keepdims=True
    )
    scale = norm_target / norm_predicted
    return mpjpe(scale * predicted, target, xp=xp)


def p_mpjpe(predicted, target):
    """Protocol #2: MPJPE after rigid (Procrustes) alignment. Host NumPy.

    predicted/target: (N, J, 3).

    Lineage: this is the standard numpy orthogonal-Procrustes alignment as
    published in VideoPose3D (MIT licence, facebookresearch/VideoPose3D
    common/loss.py) and carried verbatim by the reference (loss.py:43-82);
    it is kept step-identical on purpose — Protocol #2 numbers are only
    comparable if the reflection-fix and scale conventions match exactly.
    The TPU-native batched variant is :func:`p_mpjpe_device` below.
    """
    assert predicted.shape == target.shape

    muX = np.mean(target, axis=1, keepdims=True)
    muY = np.mean(predicted, axis=1, keepdims=True)

    X0 = target - muX
    Y0 = predicted - muY

    normX = np.sqrt(np.sum(X0 ** 2, axis=(1, 2), keepdims=True))
    normY = np.sqrt(np.sum(Y0 ** 2, axis=(1, 2), keepdims=True))

    X0 = X0 / normX
    Y0 = Y0 / normY

    H = np.matmul(X0.transpose(0, 2, 1), Y0)
    U, s, Vt = np.linalg.svd(H)
    V = Vt.transpose(0, 2, 1)
    R = np.matmul(V, U.transpose(0, 2, 1))

    # Fix improper rotations (reflections, det(R) = -1).
    sign_detR = np.sign(np.expand_dims(np.linalg.det(R), axis=1))
    V = V.copy()
    V[:, :, -1] *= sign_detR
    s = s.copy()
    s[:, -1] *= sign_detR.flatten()
    R = np.matmul(V, U.transpose(0, 2, 1))

    tr = np.expand_dims(np.sum(s, axis=1, keepdims=True), axis=2)

    a = tr * normX / normY  # optimal scale
    t = muX - a * np.matmul(muY, R)  # optimal translation

    predicted_aligned = a * np.matmul(predicted, R) + t
    return np.mean(np.linalg.norm(predicted_aligned - target, axis=len(target.shape) - 1))


def p_mpjpe_device(predicted, target):
    """Protocol #2 on device (jax.numpy batched SVD).

    Same algorithm as :func:`p_mpjpe` (the reference keeps this on host
    numpy, common/loss.py:43-82); jnp SVD lets large evaluations keep the
    metric on-chip. predicted/target: [N, J, 3].
    """
    import jax.numpy as jnp

    assert predicted.shape == target.shape
    muX = jnp.mean(target, axis=1, keepdims=True)
    muY = jnp.mean(predicted, axis=1, keepdims=True)
    X0 = target - muX
    Y0 = predicted - muY
    normX = jnp.sqrt(jnp.sum(X0 ** 2, axis=(1, 2), keepdims=True))
    normY = jnp.sqrt(jnp.sum(Y0 ** 2, axis=(1, 2), keepdims=True))
    X0 = X0 / normX
    Y0 = Y0 / normY

    H = jnp.matmul(jnp.swapaxes(X0, 1, 2), Y0)
    U, s, Vt = jnp.linalg.svd(H)
    V = jnp.swapaxes(Vt, 1, 2)
    R = jnp.matmul(V, jnp.swapaxes(U, 1, 2))
    sign_detR = jnp.sign(jnp.linalg.det(R))[:, None]
    V = V.at[:, :, -1].multiply(sign_detR)
    s = s.at[:, -1].multiply(sign_detR[:, 0])
    R = jnp.matmul(V, jnp.swapaxes(U, 1, 2))

    tr = jnp.sum(s, axis=1, keepdims=True)[:, :, None]
    a = tr * normX / normY
    t = muX - a * jnp.matmul(muY, R)
    predicted_aligned = a * jnp.matmul(predicted, R) + t
    return jnp.mean(
        jnp.sqrt(jnp.sum((predicted_aligned - target) ** 2, axis=-1))
    )


def mean_velocity_error(predicted, target):
    """MPJVE: mean Euclidean error of the first temporal derivative. Host NumPy."""
    assert predicted.shape == target.shape
    velocity_predicted = np.diff(predicted, axis=0)
    velocity_target = np.diff(target, axis=0)
    return np.mean(
        np.linalg.norm(velocity_predicted - velocity_target, axis=len(target.shape) - 1)
    )


def mean_velocity_error_train(predicted, target, axis=0, reduce="mean", xp=np):
    """Differentiable MPJVE over a chosen axis (4-D inputs)."""
    assert predicted.shape == target.shape
    assert len(predicted.shape) == 4

    def diff(a):
        if axis == 0:
            return a[1:] - a[:-1]
        elif axis == 1:
            return a[:, 1:] - a[:, :-1]
        raise ValueError(f"Unsupported axis {axis}")

    vel = _norm(diff(predicted) - diff(target), axis=-1, xp=xp)
    if reduce == "mean":
        return xp.mean(vel)
    elif reduce == "none":
        return xp.mean(vel, axis=-1)
    raise ValueError(f"Unknown reduce method: {reduce}")


def weighted_bonelen_loss(predict_3d_length, gt_3d_length, xp=np):
    """Auxiliary bone-length penalty (reference: common/loss.py:96-98;
    shipped but unused by the reference flows — kept for API parity)."""
    return 0.001 * xp.mean((predict_3d_length - gt_3d_length) ** 2)


def weighted_boneratio_loss(predict_3d_length, gt_3d_length, xp=np):
    """Auxiliary bone-ratio penalty (reference: common/loss.py:100-102)."""
    return 0.1 * xp.mean(((predict_3d_length - gt_3d_length) / gt_3d_length) ** 2)


def bone_lengths(poses, parents, xp=np):
    """Per-bone lengths [..., n_bones] from poses [..., J, 3] and a parent
    table (root entries with parent -1 are skipped)."""
    idx = [(j, p) for j, p in enumerate(parents) if p != -1]
    child = xp.asarray([j for j, _ in idx])
    par = xp.asarray([p for _, p in idx])
    return _norm(poses[..., child, :] - poses[..., par, :], axis=-1, xp=xp)


def l1_loss(predicted, target, reduce="mean", xp=np):
    assert predicted.shape == target.shape
    err = xp.abs(predicted - target)
    return xp.mean(err) if reduce == "mean" else err


def l2_loss(predicted, target, reduce="mean", xp=np):
    assert predicted.shape == target.shape
    err = (predicted - target) ** 2
    return xp.mean(err) if reduce == "mean" else err


def pck(predicted, target, threshold=150.0, valid_mask=None, xp=np):
    """3DHP PCK: fraction of joints within `threshold` (mm) of ground truth.

    predicted/target: (N, J, 3) in millimetres. valid_mask: optional (N,) bool.
    """
    assert predicted.shape == target.shape
    dist = _norm(predicted - target, axis=-1, xp=xp)  # (N, J)
    correct = (dist <= threshold).astype(np.float64 if xp is np else dist.dtype)
    if valid_mask is not None:
        correct = correct[valid_mask]
    return 100.0 * xp.mean(correct)


def auc(predicted, target, thresholds=None, valid_mask=None, xp=np):
    """3DHP AUC: mean PCK over thresholds 0..150 mm, step 5 (31 points)."""
    if thresholds is None:
        thresholds = np.arange(0, 151, 5, dtype=np.float64)
    assert predicted.shape == target.shape
    dist = _norm(predicted - target, axis=-1, xp=xp)  # (N, J)
    if valid_mask is not None:
        dist = dist[valid_mask]
    pcks = [xp.mean((dist <= th).astype(np.float64 if xp is np else dist.dtype)) for th in thresholds]
    return 100.0 * xp.mean(xp.stack([xp.asarray(p) for p in pcks]) if xp is not np else np.array(pcks))
