"""H3.6M camera-calibration parity: our constants + normalisation vs the
reference's (a single wrong digit here would silently corrupt the global
scale, the GT-2D projections, and all evaluation)."""
import sys

import numpy as np
import pytest

from diff3dhpe_tpu.data.h36m import build_h36m_cameras, h36m_skeleton

from conftest import has_reference, REFERENCE_DIR


@pytest.mark.skipif(not has_reference(), reason="reference tree not available")
def test_camera_constants_match_reference():
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    from common.camera import normalize_screen_coordinates as ref_norm
    from common.h36m_dataset import (
        h36m_cameras_extrinsic_params,
        h36m_cameras_intrinsic_params,
        h36m_skeleton as ref_skeleton,
    )

    ours = build_h36m_cameras()

    for subject, ref_cams in h36m_cameras_extrinsic_params.items():
        assert subject in ours
        for i, ref_ext in enumerate(ref_cams):
            ref_int = h36m_cameras_intrinsic_params[i]
            cam = ours[subject][i]
            assert cam["id"] == ref_int["id"]
            assert cam["res_w"] == ref_int["res_w"] and cam["res_h"] == ref_int["res_h"]

            # Reference normalisation (h36m_dataset.py:244-254) recomputed.
            center = np.array(ref_int["center"], dtype="float32")
            exp_center = ref_norm(center, w=ref_int["res_w"], h=ref_int["res_h"]).astype(
                "float32"
            )
            np.testing.assert_array_equal(cam["center"], exp_center)
            exp_focal = np.array(ref_int["focal_length"], dtype="float32") / ref_int["res_w"] * 2
            np.testing.assert_array_equal(cam["focal_length"], exp_focal)
            np.testing.assert_array_equal(
                cam["radial_distortion"],
                np.array(ref_int["radial_distortion"], dtype="float32"),
            )
            np.testing.assert_array_equal(
                cam["tangential_distortion"],
                np.array(ref_int["tangential_distortion"], dtype="float32"),
            )
            if ref_ext:
                np.testing.assert_array_equal(
                    cam["orientation"], np.array(ref_ext["orientation"], dtype="float32")
                )
                np.testing.assert_array_equal(
                    cam["translation"],
                    np.array(ref_ext["translation"], dtype="float32") / 1000.0,
                )
                np.testing.assert_array_equal(
                    cam["intrinsic"],
                    np.concatenate(
                        (cam["focal_length"], cam["center"],
                         cam["radial_distortion"], cam["tangential_distortion"])
                    ),
                )
            else:
                assert "orientation" not in cam

    # Skeleton topology matches too.
    np.testing.assert_array_equal(h36m_skeleton.parents(), ref_skeleton.parents())
    assert h36m_skeleton.joints_left() == ref_skeleton.joints_left()
    assert h36m_skeleton.joints_right() == ref_skeleton.joints_right()


@pytest.mark.skipif(not has_reference(), reason="reference tree not available")
def test_joint_reduction_matches_reference():
    """32 -> 17 joint reduction + shoulder rewiring (reference :286-292)."""
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import copy

    from common.h36m_dataset import h36m_skeleton as ref_skeleton

    ref = copy.deepcopy(ref_skeleton)
    ref.remove_joints([4, 5, 9, 10, 11, 16, 20, 21, 22, 23, 24, 28, 29, 30, 31])
    ref._parents[11] = 8
    ref._parents[14] = 8

    ours = copy.deepcopy(h36m_skeleton)
    ours.remove_joints([4, 5, 9, 10, 11, 16, 20, 21, 22, 23, 24, 28, 29, 30, 31])
    ours._parents[11] = 8
    ours._parents[14] = 8

    np.testing.assert_array_equal(ours.parents(), ref.parents())
    assert ours.joints_left() == ref.joints_left()
    assert ours.joints_right() == ref.joints_right()
    assert ours.num_joints() == 17
