#!/usr/bin/env bash
# Canonical train/eval command lines (TPU equivalents of the reference's
# Experiments.sh recipes — same hyperparameters, module paths swapped,
# GPU flags replaced by mesh shape).

### Human3.6M, CPN, 81 frames
#### Training
python -m diff3dhpe_tpu.cli.run --mesh-shape data:8 -lr 4e-4 --lr-decay 0.99 -b 64 -e 200 --max_time 61 --patience 999 --batch-size-eval 256 --timesteps 1000 --with_time_emb True --sampling_timesteps 5 --keypoints cpn_ft_h36m_dbb --beta_schedule cosine --ddim_sampling_eta 0 --embed_dim 512 --transformer_depth 8 --stride 81 --number-of-frames 81 --clip_loss True -c checkpoint/h36m/cpn/f81/ --config configs/h36m_cpn_s2s_ConditionalDiffusionMixSTES2SGRANDLinLift.json
#### Evaluation (DDIM-9)
python -m diff3dhpe_tpu.cli.run --mesh-shape data:8 --batch-size-eval 256 --with_time_emb True --sampling_timesteps 9 --keypoints cpn_ft_h36m_dbb --ddim_sampling_eta 0 --stride 81 --number-of-frames 81 --clip_loss True -c checkpoint/h36m/cpn/f81/ --evaluate best_epoch --config configs/h36m_cpn_s2s_ConditionalDiffusionMixSTES2SGRANDLinLift.json

### Human3.6M, GT, 243 frames
#### Training
python -m diff3dhpe_tpu.cli.run --mesh-shape data:8 -lr 4e-4 --lr-decay 0.99 -b 24 -e 200 --max_time 119.5 --patience 999 --batch-size-eval 256 --timesteps 1000 --with_time_emb True --sampling_timesteps 5 --keypoints gt --beta_schedule cosine --ddim_sampling_eta 0 --embed_dim 512 --transformer_depth 8 --stride 243 --number-of-frames 243 --clip_loss True -c checkpoint/h36m/gt/f243/ --config configs/h36m_gt_s2s_243f.json
#### Evaluation (DDIM-6)
python -m diff3dhpe_tpu.cli.run --mesh-shape data:8 --batch-size-eval 256 --with_time_emb True --sampling_timesteps 6 --keypoints gt --ddim_sampling_eta 0 --stride 243 --number-of-frames 243 --clip_loss True -c checkpoint/h36m/gt/f243/ --evaluate best_epoch --config configs/h36m_gt_s2s_243f.json

### MPI-INF-3DHP, GT, 27 frames
#### Training
python -m diff3dhpe_tpu.cli.run_3dhp --mesh-shape data:8 -lr 4e-4 --lr-decay 0.99 -b 64 -e 200 --max_time 69 --patience 999 --batch-size-eval 512 --timesteps 1000 --with_time_emb False --sampling_timesteps 5 --keypoints gt --beta_schedule cosine --ddim_sampling_eta 0 --embed_dim 512 --transformer_depth 8 --stride 27 --number-of-frames 27 --clip_loss True -c checkpoint/3dhp/gt/f27/ --config configs/3dhp_gt_s2s_ConditionalDiffusionMixSTES2SGRANDLinLift.json
#### Evaluation (DDIM-7; PCK/AUC computed in-framework, inference_data.mat also exported)
python -m diff3dhpe_tpu.cli.run_3dhp --mesh-shape data:8 --batch-size-eval 512 --with_time_emb False --sampling_timesteps 7 --keypoints gt --ddim_sampling_eta 0 --stride 27 --number-of-frames 27 --clip_loss True -c checkpoint/3dhp/gt/f27/ --evaluate best_epoch --config configs/3dhp_gt_s2s_ConditionalDiffusionMixSTES2SGRANDLinLift.json

### Production TPU recipe (round-2 fast paths)
# --fast-train: fused Pallas training forward (custom VJP, 1.17x the remat
#   step; gradients match flax to <1e-6). --fast-eval: fused inference
#   kernels — the f32 default is inside the 0.1 mm accuracy budget
#   (scripts/accuracy_study.json); add --compute-dtype bfloat16 for the
#   1.3x throughput mode when the budget does not apply.
python -m diff3dhpe_tpu.cli.run --mesh-shape data:8 --fast-train --fast-eval -lr 4e-4 --lr-decay 0.99 -b 24 -e 200 --timesteps 1000 --sampling_timesteps 5 --keypoints gt --stride 243 --number-of-frames 243 -c checkpoint/h36m/gt/f243_fast/ --config configs/h36m_gt_s2s_243f.json

### Recommended TPU TRAINING config (round-3 validated; PERF.md dtype section)
# bf16 fast-train converges equivalently to f32 at 1.7-2.1x wall-clock
# (scripts/dtype_equivalence.json). Eval adds the round-4 accuracy-gated
# mixed schedule: bf16 trunk + f32 head + final DDIM step at bf16x3
# contract (+0.0005 mm vs flax f32, 16.7 seq/s/chip).
python -m diff3dhpe_tpu.cli.run --mesh-shape data:8 --fast-train --fast-eval --compute-dtype bfloat16 --eval-f32-head --eval-f32-final-steps 1 -lr 4e-4 --lr-decay 0.99 -b 24 -e 200 --timesteps 1000 --sampling_timesteps 5 --keypoints gt --stride 243 --number-of-frames 243 -c checkpoint/h36m/gt/f243_bf16/ --config configs/h36m_gt_s2s_243f.json

### Long-running TPU studies (wedge-proof: run through the stall watchdog)
# bash scripts/tpu_watchdog.sh LOGFILE STALL_SECS MAX_RESTARTS CMD...
bash scripts/tpu_watchdog.sh /tmp/accuracy_study.log 900 6 python scripts/accuracy_study.py   # trained-weight accuracy gate (bench defaults)
bash scripts/tpu_watchdog.sh /tmp/dtype_eq.log 900 6 python scripts/dtype_equivalence.py      # f32-vs-bf16 training dynamics
bash scripts/tpu_watchdog.sh /tmp/probe_irred.log 600 4 python scripts/probe_irreducible.py   # attention-ablation gap decomposition

### Visualisation
python -m diff3dhpe_tpu.cli.viz --config configs/h36m_gt_s2s_ConditionalDiffusionMixSTES2SGRANDLinLift.json --evaluate best_epoch --viz-subject S11 --viz-action "Walking 1" --viz-camera 0 --viz-output viz_out

### Published-number comparison (when real archives + released .bin land)
# Evaluates every published row (4x H3.6M + 3DHP-27) through the real
# loaders and the torch-checkpoint converter; prints achieved vs published.
python scripts/published_eval.py --data-root data/ --ckpt-dir checkpoint/released/
