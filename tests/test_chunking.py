"""Chunk-index and window-materialisation tests, including exact parity with
the reference ChunkedGenerator (pure-numpy module, imported from the
reference tree when present)."""
import sys

import numpy as np
import pytest

from diff3dhpe_tpu.data import (
    build_seq2seq_chunks,
    build_seq2frame_chunks,
    materialize_window,
)

from conftest import has_reference, REFERENCE_DIR

KPS_LEFT = [4, 5, 6, 11, 12, 13]
KPS_RIGHT = [1, 2, 3, 14, 15, 16]


def _make_seqs(rng, lengths):
    poses_2d = {k: rng.standard_normal((n, 17, 2)).astype(np.float32) for k, n in lengths.items()}
    poses_3d = {k: rng.standard_normal((n, 17, 3)).astype(np.float32) for k, n in lengths.items()}
    return poses_2d, poses_3d


def test_seq2seq_chunk_structure():
    chunks = build_seq2seq_chunks({"a": 250}, 81)
    # ceil(250/81) = 4 chunks; last is end-aligned.
    assert len(chunks) == 4
    assert [c.start for c in chunks] == [0, 81, 162, 250 - 81]
    assert [c.end for c in chunks] == [81, 162, 243, 250]
    # Last chunk starts at 169, overlapping the previous chunk's [162, 243)
    # by 74 frames; the target offset encodes exactly that overlap.
    last = chunks[-1]
    assert last.start - last.target_start == 74
    # evaluated frames across all chunks == sequence length
    covered = 0
    for c in chunks:
        mask_n = c.end - c.start - max(0, c.start - c.target_start)
        covered += mask_n
    assert covered == 250


def test_seq2seq_augment_doubles():
    base = build_seq2seq_chunks({"a": 100}, 27)
    aug = build_seq2seq_chunks({"a": 100}, 27, augment=True)
    assert len(aug) == 2 * len(base)
    assert sum(c.flip for c in aug) == len(base)


def test_seq2seq_short_sequence_edge_pad(rng):
    # Sequence shorter than chunk: the single end-aligned chunk starts at
    # n - chunk_length < 0, so the window left-pads by replicating frame 0
    # (reference semantics: :36-41 + np.pad 'edge').
    poses_2d, poses_3d = _make_seqs(rng, {"a": 10})
    chunks = build_seq2seq_chunks({"a": 10}, 27)
    assert len(chunks) == 1
    assert chunks[0].start == 10 - 27 and chunks[0].end == 10
    w = materialize_window(
        chunks[0], poses_2d["a"], poses_3d["a"], pad=0, chunk_length=27,
        out_all=True, kps_left=KPS_LEFT, kps_right=KPS_RIGHT,
        joints_left=KPS_LEFT, joints_right=KPS_RIGHT,
    )
    assert w["input_2d"].shape == (27, 17, 2)
    assert w["gt_3d"].shape == (27, 17, 3)
    assert w["target_mask"] is None  # padded window -> caller treats as all-True
    # Left edge padding replicates frame 0; real frames fill the tail.
    np.testing.assert_array_equal(w["input_2d"][:17], np.repeat(poses_2d["a"][0:1], 17, 0))
    np.testing.assert_array_equal(w["input_2d"][17:], poses_2d["a"])


def test_flip_semantics(rng):
    poses_2d, poses_3d = _make_seqs(rng, {"a": 50})
    chunks = build_seq2seq_chunks({"a": 50}, 25)
    import dataclasses

    spec = dataclasses.replace(chunks[0], flip=True)
    cam = rng.standard_normal(9).astype(np.float32)
    w = materialize_window(
        spec, poses_2d["a"], poses_3d["a"], pad=0, chunk_length=25, out_all=True,
        kps_left=KPS_LEFT, kps_right=KPS_RIGHT, joints_left=KPS_LEFT,
        joints_right=KPS_RIGHT, camera=cam,
    )
    orig = poses_2d["a"][:25]
    # x negated, left/right swapped
    np.testing.assert_allclose(w["input_2d"][:, KPS_LEFT, 0], -orig[:, KPS_RIGHT, 0])
    np.testing.assert_allclose(w["input_2d"][:, KPS_LEFT, 1], orig[:, KPS_RIGHT, 1])
    # cam cx and p2 negated
    assert w["cam"][2] == -cam[2] and w["cam"][7] == -cam[7]
    assert w["cam"][0] == cam[0]
    # double flip is identity
    w2 = materialize_window(
        spec, w["input_2d"], None, pad=0, chunk_length=25, out_all=True,
        kps_left=KPS_LEFT, kps_right=KPS_RIGHT, joints_left=KPS_LEFT,
        joints_right=KPS_RIGHT,
    )
    np.testing.assert_allclose(w2["input_2d"], orig, rtol=1e-6)


def test_valid_frame_masking(rng):
    poses_2d, poses_3d = _make_seqs(rng, {"a": 54})
    valid = np.ones((54, 1))
    valid[5:9] = 0
    chunks = build_seq2seq_chunks({"a": 54}, 27)
    w = materialize_window(
        chunks[0], poses_2d["a"], poses_3d["a"], pad=0, chunk_length=27, out_all=True,
        kps_left=KPS_LEFT, kps_right=KPS_RIGHT, joints_left=KPS_LEFT,
        joints_right=KPS_RIGHT, valid_frame=valid,
    )
    expected = np.ones(27, bool)
    expected[5:9] = False
    np.testing.assert_array_equal(w["target_mask"], expected)


# ---------------------------------------------------------------------------
# Exact parity with the reference generator
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not has_reference(), reason="reference tree not available")
@pytest.mark.parametrize("chunk_length,lengths", [
    (27, {("S1", "Walk", 0): 100, ("S1", "Sit", 1): 27, ("S5", "Eat", 0): 26}),
    (81, {("S1", "Walk", 0): 250}),
])
def test_seq2seq_parity_with_reference_generator(rng, chunk_length, lengths):
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    from common.nosiy_generators import ChunkedGenerator

    poses_2d = {k: rng.standard_normal((n, 17, 2)).astype(np.float32) for k, n in lengths.items()}
    poses_3d = {k: rng.standard_normal((n, 17, 3)).astype(np.float32) for k, n in lengths.items()}
    frame_id = {k: np.arange(n) for k, n in lengths.items()}
    cams = {k: rng.standard_normal(9).astype(np.float32) for k in lengths}

    ref_gen = ChunkedGenerator(
        4, cams, poses_3d, poses_2d, frame_id, chunk_length, pad=0,
        augment=True, reverse_aug=False,
        kps_left=KPS_LEFT, kps_right=KPS_RIGHT,
        joints_left=KPS_LEFT, joints_right=KPS_RIGHT, out_all=True,
    )
    ours = build_seq2seq_chunks(lengths, chunk_length, augment=True)

    assert len(ref_gen.pairs) == len(ours)
    for ref_pair, spec in zip(ref_gen.pairs, ours):
        key, s3d, e3d, st3d, et3d, flip, reverse = ref_pair
        assert tuple(key) == tuple(str(x) for x in spec.key)
        assert (int(s3d), int(e3d), int(st3d), int(et3d), bool(flip), bool(reverse)) == (
            spec.start, spec.end, spec.target_start, spec.target_end, spec.flip, spec.reverse
        )

        ref_out = ref_gen.get_batch_seq2seq(
            seq_i=key, start_3d=s3d, end_3d=e3d, start_target_3d=st3d,
            flip=flip, reverse=reverse,
        )
        ref_cam, ref_3d, ref_2d, ref_mask = ref_out[0], ref_out[1], ref_out[2], ref_out[3]

        w = materialize_window(
            spec, poses_2d[spec.key], poses_3d[spec.key], pad=0,
            chunk_length=chunk_length, out_all=True,
            kps_left=KPS_LEFT, kps_right=KPS_RIGHT,
            joints_left=KPS_LEFT, joints_right=KPS_RIGHT,
            camera=cams[spec.key], frame_ids=frame_id[spec.key],
        )
        np.testing.assert_array_equal(w["input_2d"], ref_2d)
        np.testing.assert_array_equal(w["gt_3d"], ref_3d)
        np.testing.assert_array_equal(w["cam"], ref_cam)
        if ref_mask is None:
            assert w["target_mask"] is None
        else:
            np.testing.assert_array_equal(w["target_mask"], ref_mask)


@pytest.mark.skipif(not has_reference(), reason="reference tree not available")
def test_seq2frame_parity_with_reference_generator(rng):
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    from common.nosiy_generators import ChunkedGenerator

    lengths = {("S1", "Walk", 0): 50, ("S5", "Eat", 1): 13}
    chunk_length, pad = 1, 13  # receptive field 27
    poses_2d = {k: rng.standard_normal((n, 17, 2)).astype(np.float32) for k, n in lengths.items()}
    poses_3d = {k: rng.standard_normal((n, 17, 3)).astype(np.float32) for k, n in lengths.items()}
    frame_id = {k: np.arange(n) for k, n in lengths.items()}

    ref_gen = ChunkedGenerator(
        4, None, poses_3d, poses_2d, frame_id, chunk_length, pad=pad,
        augment=True, kps_left=KPS_LEFT, kps_right=KPS_RIGHT,
        joints_left=KPS_LEFT, joints_right=KPS_RIGHT, out_all=False,
    )
    ours = build_seq2frame_chunks(lengths, chunk_length, augment=True)
    assert len(ref_gen.pairs) == len(ours)

    for ref_pair, spec in zip(ref_gen.pairs, ours):
        key, s3d, e3d, flip, reverse = ref_pair
        assert (int(s3d), int(e3d), bool(flip), bool(reverse)) == (
            spec.start, spec.end, spec.flip, spec.reverse
        )
        ref_out = ref_gen.get_batch_seq2frame(
            seq_i=key, start_3d=s3d, end_3d=e3d, flip=flip, reverse=reverse
        )
        _, ref_3d, ref_2d = ref_out[0], ref_out[1], ref_out[2]
        w = materialize_window(
            spec, poses_2d[spec.key], poses_3d[spec.key], pad=pad,
            chunk_length=chunk_length, out_all=False,
            kps_left=KPS_LEFT, kps_right=KPS_RIGHT,
            joints_left=KPS_LEFT, joints_right=KPS_RIGHT,
        )
        np.testing.assert_array_equal(w["input_2d"], ref_2d)
        np.testing.assert_array_equal(w["gt_3d"], ref_3d)
