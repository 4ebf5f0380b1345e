from diff3dhpe_tpu.data.chunking import (
    ChunkSpec,
    build_seq2seq_chunks,
    build_seq2frame_chunks,
    materialize_window,
)
from diff3dhpe_tpu.data.dataset import PoseDataset, PoseDataset3DHP, Batch
from diff3dhpe_tpu.data.h36m import Human36mDataset, h36m_skeleton
from diff3dhpe_tpu.data.mpiinf3dhp import MPIINF3DHPDataset
from diff3dhpe_tpu.data.synthetic import make_synthetic_h36m_like

__all__ = [
    "ChunkSpec",
    "build_seq2seq_chunks",
    "build_seq2frame_chunks",
    "materialize_window",
    "PoseDataset",
    "PoseDataset3DHP",
    "Batch",
    "Human36mDataset",
    "h36m_skeleton",
    "MPIINF3DHPDataset",
    "make_synthetic_h36m_like",
]
