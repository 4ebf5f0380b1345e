"""Synthetic pose data for tests and benchmarks.

Generates smooth random-walk 3D joint trajectories in world space with
plausible scale, projects them through real H3.6M camera models to GT 2D
keypoints, and packages everything in the same npz-dict layout the real
loaders consume — so the full pipeline (camera transforms, chunking,
normalisation, training, eval) runs end-to-end without the (licensed,
non-redistributable) H3.6M data.
"""
from __future__ import annotations

import numpy as np

from diff3dhpe_tpu.data.h36m import build_h36m_cameras, h36m_skeleton
from diff3dhpe_tpu.data.mocap import MocapDataset
from diff3dhpe_tpu.geometry.camera import (
    image_coordinates,
    project_to_2d,
    world_to_camera,
)
from diff3dhpe_tpu.geometry.skeleton import Skeleton
import copy


def _random_walk_poses(rng, n_frames, n_joints=17):
    """Smooth world-space poses around the S1 capture volume (~m units)."""
    base = rng.normal(0.0, 0.4, (n_joints, 3)).astype(np.float64)
    base[:, 2] += 1.0  # above ground
    steps = rng.normal(0.0, 0.01, (n_frames, n_joints, 3))
    walk = np.cumsum(steps, axis=0)
    drift = rng.normal(0.0, 0.002, (n_frames, 1, 3)).cumsum(axis=0)
    return (base[None] + walk + drift).astype(np.float32)


class SyntheticH36MDataset(MocapDataset):
    """Drop-in Human36mDataset substitute backed by synthetic motion."""

    def __init__(self, subjects=("S1", "S5", "S9"), actions=("Walking 1", "Posing 1"),
                 n_frames=150, seed=0, n_joints=17):
        # 17-joint skeleton = reference skeleton after static-joint removal.
        skel = copy.deepcopy(h36m_skeleton)
        skel.remove_joints([4, 5, 9, 10, 11, 16, 20, 21, 22, 23, 24, 28, 29, 30, 31])
        skel._parents[11] = 8
        skel._parents[14] = 8
        super().__init__(fps=50, skeleton=skel)

        rng = np.random.default_rng(seed)
        self._cameras = build_h36m_cameras()
        self._data = {}
        all_pos_3d = []
        for subject in subjects:
            self._data[subject] = {}
            for action in actions:
                positions = _random_walk_poses(rng, n_frames, n_joints)
                self._data[subject][action] = {
                    "positions": positions,
                    "cameras": self._cameras[subject],
                }
                for cam in self._cameras[subject]:
                    pos_3d = world_to_camera(positions, R=cam["orientation"], t=cam["translation"])
                    all_pos_3d.append(pos_3d)

        all_pos_3d = np.concatenate(all_pos_3d, axis=0)
        centred = all_pos_3d - all_pos_3d[:, :1]
        self._pos_3d_min = centred.min()
        self._pos_3d_max = centred.max()
        self._w_mpjpe = None


def make_synthetic_h36m_like(subjects=("S1", "S5", "S9"), actions=("Walking 1", "Posing 1"),
                             n_frames=150, seed=0):
    """Returns (dataset, keypoints_data) where keypoints_data mimics the
    data_2d_*.npz archive (projected GT 2D in pixel coordinates + metadata)."""
    dataset = SyntheticH36MDataset(subjects, actions, n_frames, seed)

    positions_2d = {}
    for subject in subjects:
        positions_2d[subject] = {}
        for action in dataset[subject].keys():
            anim = dataset[subject][action]
            kps_all = []
            for cam in anim["cameras"]:
                pos_3d = world_to_camera(
                    anim["positions"], R=cam["orientation"], t=cam["translation"]
                )
                pos_2d = project_to_2d(pos_3d[None], cam["intrinsic"][None])[0]
                # Store pixel coordinates — the same contract as the real
                # data_2d_*.npz archive (prepare_data_h36m.py:122-147 writes
                # image_coordinates output); PoseDataset screen-normalises.
                pos_2d_pixel = image_coordinates(pos_2d, w=cam["res_w"], h=cam["res_h"])
                kps_all.append(pos_2d_pixel.astype(np.float32))
            positions_2d[subject][action] = kps_all

    keypoints_data = {
        "positions_2d": positions_2d,
        "metadata": {
            "num_joints": 17,
            "keypoints_symmetry": [
                list(dataset.skeleton().joints_left()),
                list(dataset.skeleton().joints_right()),
            ],
        },
    }
    return dataset, keypoints_data
