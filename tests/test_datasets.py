"""Dataset-class tests: HumanEva/Custom construction from synthetic npz,
seq2frame (out_all=False) pipeline, 3DHP wrapper, corruptions."""
import numpy as np
import pytest

from diff3dhpe_tpu.config import Config
from diff3dhpe_tpu.data import PoseDataset, make_synthetic_h36m_like
from diff3dhpe_tpu.data.dataset import PoseDataset3DHP
from diff3dhpe_tpu.data.synthetic import make_synthetic_3dhp


def test_humaneva_dataset(tmp_path):
    from diff3dhpe_tpu.data.humaneva import HumanEvaDataset

    rng = np.random.default_rng(0)
    positions = {
        "Train/S1": {"Walking 1": rng.standard_normal((50, 15, 3)).astype("float32")},
    }
    path = tmp_path / "data_3d_humaneva15.npz"
    np.savez_compressed(path, positions_3d=positions)
    ds = HumanEvaDataset(str(path))
    assert ds.skeleton().num_joints() == 15
    # the scale extrema the reference forgets are computed here
    assert np.isfinite(ds._pos_3d_min) and np.isfinite(ds._pos_3d_max)
    assert ds._pos_3d_max > ds._pos_3d_min


def test_custom_dataset(tmp_path):
    from diff3dhpe_tpu.data.custom import CustomDataset

    rng = np.random.default_rng(0)
    metadata = {
        "layout_name": "coco",
        "num_joints": 17,
        "keypoints_symmetry": [[1, 3, 5], [2, 4, 6]],
        "video_metadata": {"vid.mp4": {"w": 1920, "h": 1080}},
    }
    path = tmp_path / "data_2d_custom_myvideo.npz"
    np.savez_compressed(
        path,
        positions_2d={"vid.mp4": {"custom": [rng.standard_normal((40, 17, 2)).astype("float32")]}},
        metadata=metadata,
    )
    ds = CustomDataset(str(path))
    cams = ds.cameras()["vid.mp4"]
    assert cams[0]["res_w"] == 1920 and cams[0]["res_h"] == 1080
    assert ds._pos_3d_min == -1.0 and ds._pos_3d_max == 1.0


def test_seq2frame_pipeline():
    """out_all=False: center-frame target with padded 2D context."""
    cfg = Config(
        stride=1, number_of_frames=9, out_all=False,
        subjects_train="S1", subjects_test="S9",
        batch_size=8, test_time_augmentation=True,
    )
    dataset, kp = make_synthetic_h36m_like(subjects=("S1", "S9"), n_frames=30, seed=0)
    ds = PoseDataset(cfg, dataset, "data", "test", keypoints_data=kp)
    item = ds.get_item(0)
    assert item["input_2d"].shape == (9, 17, 2)  # 1 + 2*pad context
    assert item["gt_3d"].shape == (1, 17, 3)  # single target frame
    assert item["target_mask"].shape == (1,)
    b = next(ds.batches(8))
    assert b.gt_3d.shape == (8, 1, 17, 3)
    assert b.input_2d.shape == (8, 9, 17, 2)


def test_corruptions_applied():
    cfg = Config(stride=9, number_of_frames=9, subjects_train="S1", subjects_test="S9")
    dataset, kp = make_synthetic_h36m_like(subjects=("S1", "S9"), n_frames=30, seed=0)
    clean = PoseDataset(cfg, dataset, "data", "test", keypoints_data=kp)
    noisy = PoseDataset(cfg, dataset, "data", "test", noise_std=0.1, keypoints_data=kp)
    dropped = PoseDataset(cfg, dataset, "data", "test", joint_drop_rate=0.5, keypoints_data=kp)
    a = clean.get_item(0)["input_2d"]
    b = noisy.get_item(0)["input_2d"]
    c = dropped.get_item(0)["input_2d"]
    assert not np.allclose(a, b)
    # joint drop zeroes whole joints
    zeroed = np.all(c == 0, axis=-1)
    assert zeroed.any() and not zeroed.all()


def test_3dhp_valid_frame_mask_flows_to_batches():
    cfg = Config(
        stride=9, number_of_frames=9, subjects_train="S1",
        subjects_test="TS1,TS2", dataset="3dhp",
    )
    data = make_synthetic_3dhp(["S1"], ["TS1", "TS2"], n_frames=40, seed=0)
    ds = PoseDataset3DHP(cfg, data._test, data._pos_3d_min, data._pos_3d_max, split="test")
    total_valid = sum(v.sum() for v in data._test.valid_frame.values())
    masked = 0
    for b in ds.batches(16):
        masked += (b.target_mask & b.row_mask[:, None]).sum()
    # every *valid* frame is evaluated exactly once
    assert masked == total_valid


def test_multi_hypothesis_eval_step():
    import jax
    import jax.numpy as jnp

    from diff3dhpe_tpu.diffusion import GaussianDiffusion
    from diff3dhpe_tpu.engine import make_denoise_fn, make_eval_step
    from diff3dhpe_tpu.models import MixSTEDenoiser

    model = MixSTEDenoiser(num_frame=9, num_joints=17, in_chans=2, embed_dim=32,
                           depth=1, num_heads=4, qkv_bias=True, mode="s2s")
    diff = GaussianDiffusion.create(make_denoise_fn(model), timesteps=20,
                                    sampling_timesteps=3, beta_schedule="cosine")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 9, 17, 5)), jnp.zeros((1,)))["params"]
    jl, jr = [4, 5, 6, 11, 12, 13], [1, 2, 3, 14, 15, 16]
    x2d = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 17, 2))
    single = make_eval_step(diff, jl, jr, repeat_n=1)(params, jax.random.PRNGKey(2), x2d, x2d)
    multi = make_eval_step(diff, jl, jr, repeat_n=4)(params, jax.random.PRNGKey(2), x2d, x2d)
    assert single.shape == multi.shape == (2, 9, 17, 3)
    assert not np.allclose(np.asarray(single), np.asarray(multi))
    # hypothesis averaging reduces sampling variance: multi should be closer
    # to a second independent multi-run than two single runs are
    single2 = make_eval_step(diff, jl, jr, repeat_n=1)(params, jax.random.PRNGKey(3), x2d, x2d)
    multi2 = make_eval_step(diff, jl, jr, repeat_n=4)(params, jax.random.PRNGKey(3), x2d, x2d)
    var_single = float(np.mean((np.asarray(single) - np.asarray(single2)) ** 2))
    var_multi = float(np.mean((np.asarray(multi) - np.asarray(multi2)) ** 2))
    assert var_multi < var_single


def test_val_split_uses_train_subjects_without_augmentation():
    """'val' split (reference run.py:278-284, load_noisy_data.py:95-107):
    train subjects, no flip augmentation in the chunk index, flip-TTA copies
    present for the per-epoch validation pass, and its own noise knobs."""
    cfg = Config(
        stride=9, number_of_frames=9, subjects_train="S1", subjects_test="S9",
        data_augmentation=True, test_time_augmentation=True,
    )
    dataset, kp = make_synthetic_h36m_like(subjects=("S1", "S9"), n_frames=30, seed=0)
    train = PoseDataset(cfg, dataset, "data", "train", keypoints_data=kp)
    val = PoseDataset(
        cfg, dataset, "data", "val", noise_std=0.05, keypoints_data=kp
    )
    test = PoseDataset(cfg, dataset, "data", "test", keypoints_data=kp)

    assert {k[0] for k in val.poses_2d} == {"S1"}
    assert {k[0] for k in test.poses_2d} == {"S9"}
    # train has flip-augmented chunk pairs; val does not
    assert any(p.flip for p in train.pairs)
    assert not any(p.flip for p in val.pairs)
    # val items carry the flip-TTA copy (train items don't)...
    assert "input_2d_flip" in val.get_item(0)
    assert "input_2d_flip" not in train.get_item(0)
    # ...and the val-specific corruption knob is applied
    clean_val = PoseDataset(cfg, dataset, "data", "val", keypoints_data=kp)
    assert not np.allclose(val.get_item(0)["input_2d"], clean_val.get_item(0)["input_2d"])


def test_shared_keypoints_archive_not_mutated_across_splits():
    """Regression: the round-2 prepare/fetch port screen-normalised the
    injected archive's arrays IN PLACE, so the second split built over the
    same archive (train then val, or test then per-action) normalised its 2D
    inputs twice — collapsing them to ~-1 and silently feeding garbage to
    early-stop/best-checkpoint selection on every shared-archive run. The
    record stream computes on copies: the archive must survive any number of
    split constructions bit-identically, and same-subject splits must see
    identical normalised tracks."""
    cfg = Config(
        stride=9, number_of_frames=9, subjects_train="S1", subjects_test="S9",
    )
    dataset, kp = make_synthetic_h36m_like(subjects=("S1", "S9"), n_frames=30, seed=0)
    before = {
        (s, a): [c.copy() for c in kp["positions_2d"][s][a]]
        for s in kp["positions_2d"]
        for a in kp["positions_2d"][s]
    }
    train = PoseDataset(cfg, dataset, "data", "train", keypoints_data=kp)
    val = PoseDataset(cfg, dataset, "data", "val", keypoints_data=kp)
    test1 = PoseDataset(cfg, dataset, "data", "test", keypoints_data=kp)
    test2 = PoseDataset(cfg, dataset, "data", "test", keypoints_data=kp)
    for (s, a), cams_2d in before.items():
        for i, arr in enumerate(cams_2d):
            assert np.array_equal(kp["positions_2d"][s][a][i], arr), (s, a, i)
    for key in train.poses_2d:
        assert np.array_equal(train.poses_2d[key], val.poses_2d[key])
    for key in test1.poses_2d:
        assert np.array_equal(test1.poses_2d[key], test2.poses_2d[key])
    # Screen-normalised pixel coords live in [-1, 1]ish — double
    # normalisation would pin them to ~-1.
    v = val.poses_2d[next(iter(val.poses_2d))]
    assert v.min() > -1.5 and v.max() < 1.5 and np.ptp(v) > 0.1
    # The memoized camera-space 3D arrays (dataset._camera_space_poses) are
    # handed to every split UNCOPIED; they are frozen so an in-place
    # transform raises instead of silently corrupting sibling splits' GT.
    key3 = next(iter(train.poses_3d))
    with pytest.raises(ValueError):
        train.poses_3d[key3][0, 0, 0] = 99.0


def test_latent_synthetic_motion_is_manifold_structured():
    """motion="latent" poses must lie on ONE fixed low-dim affine manifold
    shared across subjects/actions — the structure that makes monocular
    2D->3D lifting learnable (data/synthetic.py::_latent_motion_poses) —
    while motion="walk" poses must not (they span the full joint space)."""
    dataset, kp = make_synthetic_h36m_like(
        subjects=("S1", "S9"), n_frames=120, seed=0, motion="latent"
    )
    all_poses = np.concatenate(
        [dataset[s][a]["positions"].reshape(-1, 51)
         for s in ("S1", "S9") for a in dataset[s].keys()]
    )
    centred = all_poses - all_poses.mean(axis=0)
    sv = np.linalg.svd(centred, compute_uv=False)
    # 8 latent dims: singular values 9.. are numerically zero.
    assert sv[8] / sv[0] < 1e-5

    walk, _ = make_synthetic_h36m_like(
        subjects=("S1",), n_frames=120, seed=0, motion="walk"
    )
    wposes = np.concatenate(
        [walk["S1"][a]["positions"].reshape(-1, 51) for a in walk["S1"].keys()]
    )
    wc = wposes - wposes.mean(axis=0)
    wsv = np.linalg.svd(wc, compute_uv=False)
    assert wsv[8] / wsv[0] > 1e-3  # unstructured: no 8-dim collapse

    # The 2D keypoints remain exact camera projections (same contract as
    # the real data_2d npz): finite, pixel-scale values for every camera.
    k2d = kp["positions_2d"]["S1"][next(iter(kp["positions_2d"]["S1"]))]
    assert len(k2d) == 4 and np.isfinite(k2d[0]).all()

    # Latent mode shares ONE camera set across subjects (per-subject
    # extrinsics would bound any model at ~100 mm on this task; with shared
    # cameras the held-out floor is 0 — see synthetic.py).
    cams = dataset.cameras()
    assert cams["S9"] is cams["S1"]
    wcams = walk.cameras()
    assert wcams["S9"] is not wcams["S1"]  # walk mode keeps real extrinsics


def test_camera_space_conversion_memoized_across_splits(monkeypatch):
    """world->camera conversion runs once per (subject, action) per dataset:
    the train/val/test trio over one dataset must not recompute it (the old
    port cached by mutating the input; the weak memo keeps that cost profile
    without the mutation)."""
    import diff3dhpe_tpu.data.dataset as dsmod

    calls = []
    orig = dsmod.world_to_camera

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(dsmod, "world_to_camera", counting)
    cfg = Config(stride=9, number_of_frames=9, subjects_train="S1", subjects_test="S9")
    dataset, kp = make_synthetic_h36m_like(subjects=("S1", "S9"), n_frames=30, seed=0)
    for split in ("train", "val", "test", "test"):
        PoseDataset(cfg, dataset, "data", split, keypoints_data=kp)
    # S1 and S9 each: 2 actions x 4 cameras, converted exactly once.
    assert len(calls) == 2 * 2 * 4
