"""MPI-INF-3DHP dataset (reference: common/mpiinf3dhp_dataset.py).

Loads the P-STMO-style preprocessed ``data_train_3dhp.npz`` /
``data_test_3dhp.npz`` archives: root-centres on joint 14, screen-normalises
2D at 2048x2048 (train / TS1-4) or 1920x1080 (TS5-6), and computes the
global min/max over train+test for the scalar 3D normalisation.
"""
from __future__ import annotations

import os

import numpy as np

from diff3dhpe_tpu.geometry.camera import normalize_screen_coordinates

KPS_LEFT = [5, 6, 7, 11, 12, 13]
KPS_RIGHT = [2, 3, 4, 8, 9, 10]
JOINTS_LEFT = KPS_LEFT
JOINTS_RIGHT = KPS_RIGHT
NUM_JOINTS = 17
ROOT_JOINT = 14


class Base3DHPSplit:
    def __init__(self, path, subjects_list, train=True):
        data = np.load(path, allow_pickle=True)["data"].item()
        self.kps_left, self.kps_right = KPS_LEFT, KPS_RIGHT
        self.joints_left, self.joints_right = JOINTS_LEFT, JOINTS_RIGHT
        self.num_joints = NUM_JOINTS
        self.subjects_list = subjects_list
        self._prepare(data, train)

    def _prepare(self, data, train):
        out_poses_3d = {}
        out_poses_2d = {}
        all_pos_3d = []

        if train:
            valid_frame = None
            for seq in data.keys():
                for cam in data[seq][0].keys():
                    anim = data[seq][0][cam]
                    subject_name, seq_name = seq.split(" ")
                    data_3d = anim["data_3d"]
                    data_3d = data_3d - data_3d[:, ROOT_JOINT : ROOT_JOINT + 1]
                    data_3d = data_3d.astype("float32")
                    all_pos_3d.append(data_3d)
                    if subject_name in self.subjects_list:
                        out_poses_3d[(subject_name, seq_name, cam)] = data_3d
                        data_2d = anim["data_2d"].copy()
                        data_2d[..., :2] = normalize_screen_coordinates(
                            data_2d[..., :2], w=2048, h=2048
                        )
                        out_poses_2d[(subject_name, seq_name, cam)] = data_2d.astype("float32")
        else:
            valid_frame = {}
            for seq in data.keys():
                anim = data[seq]
                data_3d = anim["data_3d"]
                data_3d = data_3d - data_3d[:, ROOT_JOINT : ROOT_JOINT + 1]
                data_3d = data_3d.astype("float32")
                all_pos_3d.append(data_3d)
                if seq in self.subjects_list:
                    valid_frame[seq] = anim["valid"]
                    out_poses_3d[seq] = data_3d
                    data_2d = anim["data_2d"].copy()
                    if seq in ("TS5", "TS6"):
                        width, height = 1920, 1080
                    else:
                        width, height = 2048, 2048
                    data_2d[..., :2] = normalize_screen_coordinates(
                        data_2d[..., :2], w=width, h=height
                    )
                    out_poses_2d[seq] = data_2d.astype("float32")

        self.poses_3d = out_poses_3d
        self.poses_2d = out_poses_2d
        self.valid_frame = valid_frame

        all_pos_3d = np.concatenate(all_pos_3d, axis=0)
        self.pos_3d_min = all_pos_3d.min()
        self.pos_3d_max = all_pos_3d.max()


class MPIINF3DHPDataset:
    def __init__(self, subjects_train, subjects_test, root_path="data"):
        if isinstance(subjects_train, str):
            subjects_train = subjects_train.split(",")
        if isinstance(subjects_test, str):
            subjects_test = subjects_test.split(",")
        self._train = Base3DHPSplit(
            os.path.join(root_path, "data_train_3dhp.npz"), subjects_train, train=True
        )
        self._test = Base3DHPSplit(
            os.path.join(root_path, "data_test_3dhp.npz"), subjects_test, train=False
        )
        self._pos_3d_min = min(self._train.pos_3d_min, self._test.pos_3d_min)
        self._pos_3d_max = max(self._train.pos_3d_max, self._test.pos_3d_max)
        self.kps_left, self.kps_right = KPS_LEFT, KPS_RIGHT
        self.joints_left, self.joints_right = JOINTS_LEFT, JOINTS_RIGHT
        self.num_joints = NUM_JOINTS
