"""HumanEva-I dataset (reference: common/humaneva_dataset.py).

15-joint skeleton and the public HumanEva camera calibration. Note: the
reference version never computes _pos_3d_min/_pos_3d_max, so its
load_Dataset path crashes (SURVEY.md 2.1 #14) — this implementation computes
them the same way the H3.6M loader does, making the dataset actually usable.
"""
from __future__ import annotations

import copy

import numpy as np

from diff3dhpe_tpu.data.mocap import MocapDataset
from diff3dhpe_tpu.geometry.camera import normalize_screen_coordinates, world_to_camera
from diff3dhpe_tpu.geometry.skeleton import Skeleton

humaneva_skeleton = Skeleton(
    parents=[-1, 0, 1, 2, 3, 1, 5, 6, 0, 8, 9, 0, 11, 12, 1],
    joints_left=[2, 3, 4, 8, 9, 10],
    joints_right=[5, 6, 7, 11, 12, 13],
)

_CAMERAS_INTRINSIC = [
    {"id": "C1", "res_w": 640, "res_h": 480, "azimuth": 0,
     "center": [299.264884, 224.011557], "focal_length": [765.788214, 765.527418],
     "radial_distortion": [-0.288198, 0.099026, 0.0], "tangential_distortion": [0.001253, -0.000425]},
    {"id": "C2", "res_w": 640, "res_h": 480, "azimuth": -90,
     "center": [341.650227, 234.103088], "focal_length": [767.617322, 767.142609],
     "radial_distortion": [-0.282131, 0.082447, 0.0], "tangential_distortion": [-0.000483, -0.000695]},
    {"id": "C3", "res_w": 640, "res_h": 480, "azimuth": 90,
     "center": [320.217920, 244.382774], "focal_length": [764.727122, 764.045019],
     "radial_distortion": [-0.270482, 0.063358, 0.0], "tangential_distortion": [-0.001497, -0.000394]},
]


class HumanEvaDataset(MocapDataset):
    def __init__(self, path):
        super().__init__(fps=60, skeleton=copy.deepcopy(humaneva_skeleton))

        cameras = copy.deepcopy(_CAMERAS_INTRINSIC)
        for cam in cameras:
            for k, v in cam.items():
                if k not in ("id", "res_w", "res_h"):
                    cam[k] = np.array(v, dtype="float32")
            cam["center"] = normalize_screen_coordinates(
                cam["center"], w=cam["res_w"], h=cam["res_h"]
            ).astype("float32")
            cam["focal_length"] = cam["focal_length"] / cam["res_w"] * 2
            cam["intrinsic"] = np.concatenate(
                (cam["focal_length"], cam["center"],
                 cam["radial_distortion"], cam["tangential_distortion"])
            )

        data = np.load(path, allow_pickle=True)["positions_3d"].item()

        self._cameras = {}
        self._data = {}
        all_pos_3d = []
        for subject, actions in data.items():
            self._cameras[subject] = cameras
            self._data[subject] = {}
            for action_name, positions in actions.items():
                entry = {"cameras": cameras}
                if isinstance(positions, dict):
                    # Archive with precomputed per-camera positions.
                    entry.update(positions)
                else:
                    entry["positions"] = positions
                self._data[subject][action_name] = entry
                pos = entry.get("positions")
                if pos is not None:
                    for cam in cameras:
                        if "orientation" in cam:
                            pos_3d = world_to_camera(pos, R=cam["orientation"], t=cam["translation"])
                        else:
                            pos_3d = pos
                        all_pos_3d.append(pos_3d)

        # Global scale extrema — the reference forgets these (its HumanEva
        # path would crash in load_Dataset); computed like H3.6M.
        if all_pos_3d:
            cat = np.concatenate(all_pos_3d, axis=0)
            centred = cat - cat[:, :1]
            self._pos_3d_min = centred.min()
            self._pos_3d_max = centred.max()
        else:
            self._pos_3d_min, self._pos_3d_max = -1.0, 1.0
        self._w_mpjpe = None
