"""H3.6M preparation-script test against a miniature fake archive."""
import os
import zipfile

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from diff3dhpe_tpu.data.prepare_h36m import SUBJECTS, from_archive, generate_gt_2d


ACTIONS = [
    "Directions", "Discussion", "Eating", "Greeting", "Phoning",
    "TakingPhoto", "Posing", "Purchases", "Sitting", "SittingDown",
    "Smoking", "Waiting", "WalkDog", "Walking", "WalkTogether",
]


def _make_fake_archive(path, n_frames=8):
    rng = np.random.default_rng(0)
    with zipfile.ZipFile(path, "w") as zf:
        for subject in SUBJECTS:
            for action in ACTIONS:
                for suffix in ("", " 1"):
                    h5_path = f"/tmp/_fake_{subject}_{action}{suffix}.h5"
                    with h5py.File(h5_path, "w") as hf:
                        # [32*3, T] layout, millimetres (as the official h5s)
                        hf["3D_positions"] = rng.standard_normal(
                            (96, n_frames)
                        ).astype("float32") * 1000
                    zf.write(
                        h5_path,
                        f"h36m/{subject}/MyPoses/3D_positions/{action}{suffix}.h5",
                    )
                    os.remove(h5_path)


def test_from_archive_and_gt2d(tmp_path):
    archive = str(tmp_path / "h36m.zip")
    _make_fake_archive(archive)

    data = from_archive(archive, str(tmp_path))
    # S11 'Directions' is dropped (corrupt in the official release);
    # TakingPhoto/WalkingDog canonicalised.
    assert "Directions" not in data["S11"]
    assert "Directions" in data["S1"]
    assert "Photo" in data["S1"] and "TakingPhoto" not in data["S1"]
    assert data["S1"]["Walking"].shape == (8, 32, 3)
    # mm -> metres
    assert np.abs(data["S1"]["Walking"]).max() < 10

    out_3d = str(tmp_path / "data_3d_h36m.npz")
    np.savez_compressed(out_3d, positions_3d=data)
    generate_gt_2d(out_3d, str(tmp_path))

    kp = np.load(str(tmp_path / "data_2d_h36m_gt.npz"), allow_pickle=True)
    meta = kp["metadata"].item()
    assert meta["num_joints"] == 17
    assert len(meta["keypoints_symmetry"][0]) == len(meta["keypoints_symmetry"][1])
    pos2d = kp["positions_2d"].item()
    assert len(pos2d["S1"]["Walking"]) == 4  # one per camera
    assert pos2d["S1"]["Walking"][0].shape == (8, 17, 2)
