"""diff3dhpe_tpu — TPU-native JAX framework for diffusion-based 3D human pose estimation.

A ground-up TPU-first rebuild of the capabilities of csiro-icvg/Diff3DHPE
(ICCVW 2023): lifting 2D keypoint sequences to 3D pose sequences with a DDIM
reverse-diffusion loop whose denoiser is a MixSTE spatio-temporal transformer
with GRAND-style attention.

Architecture (all compute-path code is jax/XLA/pallas; data plumbing is numpy):

- ``geometry``  — quaternion/camera/skeleton primitives (reference: common/camera.py,
  common/quaternion.py, common/skeleton.py).
- ``diffusion`` — beta schedules and the GaussianDiffusion engine; the DDIM
  sampling loop is a single ``lax.scan`` inside one jitted program (reference:
  common/conditional_diffusion_ddim_*_crossFrames.py re-launches the model from
  Python each step).
- ``models``    — MixSTE denoiser as a flax.linen module, seq2seq + seq2frame
  output modes (reference: common/nets/model_conditional_diffusion_mixste_*.py).
- ``ops``       — Pallas TPU kernels (fused GRAND attention) + XLA fallbacks.
- ``data``      — dataset loaders, chunked window index, flip augmentation
  (reference: data/load_noisy_data.py, common/nosiy_generators.py).
- ``metrics``   — MPJPE / P-MPJPE / N-MPJPE / MPJVE / PCK / AUC
  (reference: common/loss.py + the external MATLAB 3DHP evaluator).
- ``engine``    — jit/pjit train + eval steps, sharded over a device mesh.
- ``parallel``  — mesh construction and sharding rules (data + tensor axes).
- ``io``        — orbax checkpointing, torch-checkpoint converter, run logs.
- ``config``    — typed config mirroring the reference's configs/*.json keys.
"""

__version__ = "0.1.0"
