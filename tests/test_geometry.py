"""Geometry primitive tests: golden values + torch cross-checks.

Reference semantics: common/quaternion.py, common/camera.py.
"""
import numpy as np
import pytest

from diff3dhpe_tpu.geometry import (
    qrot,
    qinverse,
    normalize_screen_coordinates,
    image_coordinates,
    world_to_camera,
    camera_to_world,
    project_to_2d,
    project_to_2d_linear,
)

torch = pytest.importorskip("torch")


def _rand_unit_quat(rng, shape):
    q = rng.standard_normal(shape + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def _torch_qrot(q, v):
    qvec = q[..., 1:]
    uv = torch.cross(qvec, v, dim=len(q.shape) - 1)
    uuv = torch.cross(qvec, uv, dim=len(q.shape) - 1)
    return v + 2 * (q[..., :1] * uv + uuv)


def test_qrot_matches_torch(rng):
    q = _rand_unit_quat(rng, (5, 7)).astype(np.float32)
    v = rng.standard_normal((5, 7, 3)).astype(np.float32)
    ours = qrot(q, v)
    theirs = _torch_qrot(torch.from_numpy(q), torch.from_numpy(v)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


def test_qrot_identity(rng):
    v = rng.standard_normal((4, 3))
    q = np.broadcast_to(np.array([1.0, 0, 0, 0]), (4, 4))
    np.testing.assert_allclose(qrot(q, v), v, atol=1e-12)


def test_qrot_90deg_about_z():
    # 90 degrees about z maps x->y.
    half = np.sqrt(0.5)
    q = np.array([[half, 0, 0, half]])
    v = np.array([[1.0, 0.0, 0.0]])
    np.testing.assert_allclose(qrot(q, v), [[0.0, 1.0, 0.0]], atol=1e-12)


def test_qinverse_roundtrip(rng):
    q = _rand_unit_quat(rng, (6,))
    v = rng.standard_normal((6, 3))
    np.testing.assert_allclose(qrot(qinverse(q), qrot(q, v)), v, atol=1e-10)


def test_world_camera_roundtrip(rng):
    R = _rand_unit_quat(rng, ())
    t = rng.standard_normal(3)
    X = rng.standard_normal((10, 17, 3))
    cam = world_to_camera(X, R, t)
    back = camera_to_world(cam, R, t)
    np.testing.assert_allclose(back, X, atol=1e-10)


def test_normalize_screen_roundtrip(rng):
    X = rng.uniform(0, 1000, (7, 17, 2))
    n = normalize_screen_coordinates(X, w=1000, h=1002)
    assert n.max() <= 1.0 + 1e-9
    back = image_coordinates(n, w=1000, h=1002)
    np.testing.assert_allclose(back, X, atol=1e-9)


def test_normalize_screen_golden():
    # [0, w] -> [-1, 1] on x; y offset preserves aspect ratio.
    X = np.array([[0.0, 0.0], [1000.0, 1002.0]])
    n = normalize_screen_coordinates(X, w=1000, h=1002)
    np.testing.assert_allclose(n, [[-1.0, -1.002], [1.0, 1.002]])


def _torch_project_to_2d(X, camera_params):
    while len(camera_params.shape) < len(X.shape):
        camera_params = camera_params.unsqueeze(1)
    f = camera_params[..., :2]
    c = camera_params[..., 2:4]
    k = camera_params[..., 4:7]
    p = camera_params[..., 7:]
    XX = torch.clamp(X[..., :2] / X[..., 2:], min=-1, max=1)
    r2 = torch.sum(XX[..., :2] ** 2, dim=len(XX.shape) - 1, keepdim=True)
    radial = 1 + torch.sum(
        k * torch.cat((r2, r2 ** 2, r2 ** 3), dim=len(r2.shape) - 1),
        dim=len(r2.shape) - 1,
        keepdim=True,
    )
    tan = torch.sum(p * XX, dim=len(XX.shape) - 1, keepdim=True)
    XXX = XX * (radial + tan) + p * r2
    return f * XXX + c


def test_project_to_2d_matches_torch(rng):
    X = rng.standard_normal((4, 17, 3)).astype(np.float32)
    X[..., 2] += 5.0  # keep in front of camera
    cams = rng.standard_normal((4, 9)).astype(np.float32) * 0.1
    cams[:, :2] += 2.0
    ours = project_to_2d(X, cams)
    theirs = _torch_project_to_2d(torch.from_numpy(X), torch.from_numpy(cams)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)

    ours_lin = project_to_2d_linear(X, cams)
    f, c = cams[:, None, :2], cams[:, None, 2:4]
    expected = f * np.clip(X[..., :2] / X[..., 2:], -1, 1) + c
    np.testing.assert_allclose(ours_lin, expected, rtol=1e-6)
