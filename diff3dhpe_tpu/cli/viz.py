"""Visualisation entry point.

Equivalent of the reference's visualization_ani.py / visualization_fig.py
drivers: for one (subject, action, camera), run the model with diffusion
introspection enabled and render
- the input 2D keypoint animation,
- GT vs reconstruction 3D animation (world space, trajectory re-anchored,
  per-frame MPJPE in the title),
- the forward-diffusion chain (get_noisy_pose) animation,
- the reverse-diffusion chain (DDIM collect_chain) animation,
- static snapshots of the reverse chain at start/middle/end steps.

Outputs GIF/PNG (no ffmpeg in this image). Supports --synthetic.
"""
from __future__ import annotations

import os

import numpy as np


def main(argv=None):
    from diff3dhpe_tpu.cli.args import args_to_overrides, build_parser

    parser = build_parser()
    parser.add_argument("--viz-subject", type=str, default=None)
    parser.add_argument("--viz-action", type=str, default=None)
    parser.add_argument("--viz-camera", type=int, default=0)
    parser.add_argument("--viz-output", type=str, default="viz_out")
    parser.add_argument("--viz-limit", type=int, default=60, help="frames to render")
    parser.add_argument("--viz-chain-samples", type=int, default=20,
                        help="forward-diffusion snapshots")
    parser.add_argument("--viz-video", type=str, default=None,
                        help="footage to overlay poses on: a frame directory, "
                             "GIF, or imageio-readable file")
    parser.add_argument("--viz-video-skip", type=int, default=0,
                        help="frames to skip at the start of the footage")
    args = parser.parse_args(argv)

    from diff3dhpe_tpu.config import load_config

    cfg = load_config(args.config, args_to_overrides(args))

    import jax
    import jax.numpy as jnp

    from diff3dhpe_tpu.data import Human36mDataset, PoseDataset, make_synthetic_h36m_like
    from diff3dhpe_tpu.data.dataset import _WindowedPoseData
    from diff3dhpe_tpu.engine.runner import Runner
    from diff3dhpe_tpu.geometry.camera import camera_to_world, image_coordinates, world_to_camera
    from diff3dhpe_tpu.io.checkpoint import load_torch_model_params, restore_checkpoint
    from diff3dhpe_tpu.viz import (
        read_video,
        render_2d_animation,
        render_2d_figs,
        render_3d_animation,
        render_3d_figs,
        render_chain_animation,
        render_hypotheses_animation,
        render_video_overlay,
    )

    os.makedirs(args.viz_output, exist_ok=True)

    keypoints_data = None
    if args.synthetic:
        dataset, keypoints_data = make_synthetic_h36m_like(
            subjects=tuple(dict.fromkeys(
                cfg.subjects_train.split(",") + cfg.subjects_test.split(","))),
            n_frames=max(4 * cfg.number_of_frames, 100), seed=cfg.seed,
        )
    else:
        dataset = Human36mDataset(f"{cfg.data_root}/data_3d_{cfg.dataset}.npz")

    subject = args.viz_subject or cfg.subjects_test.split(",")[0]
    action = args.viz_action or next(iter(dataset[subject].keys()))
    cam_idx = args.viz_camera

    base = PoseDataset(
        cfg, dataset, cfg.data_root, "test", action_filter=[action.split(" ")[0]],
        keypoints_data=keypoints_data,
    )
    seq_key = (subject, action, cam_idx)
    assert seq_key in base.poses_2d, f"{seq_key} not in test split"
    seq_ds = _WindowedPoseData(
        poses_2d={seq_key: base.poses_2d[seq_key]},
        poses_3d={seq_key: base.poses_3d[seq_key]},
        cameras={seq_key: base.cameras[seq_key]} if base.cameras else None,
        valid_frame=None,
        scale=base.scale,
        chunk_length=base.chunk_length,
        pad=base.pad,
        out_all=base.out_all,
        kps_left=base.kps_left, kps_right=base.kps_right,
        joints_left=base.joints_left, joints_right=base.joints_right,
        augment=False, test_aug=cfg.test_time_augmentation, train=False,
    )
    seq_ds.num_joints = base.num_joints

    runner = Runner(cfg, base.num_joints, base.joints_left, base.joints_right)
    runner.set_params(runner.init_params())
    ckpt = cfg.evaluate or cfg.pretrained_model
    if ckpt:
        path = os.path.join(cfg.checkpoint, ckpt) if not os.path.exists(ckpt) else ckpt
        if path.endswith(".bin"):
            runner.set_params(load_torch_model_params(
                path, depth=cfg.transformer_depth,
                with_time_emb=cfg.with_time_emb,
                mode="s2s" if cfg.out_all else "s2f"))
        else:
            state, _ = restore_checkpoint(path, runner.state)
            runner.state = state
        print(f"Loaded checkpoint {path}")

    # ------------------------------------------------------------------
    # Predictions + diffusion chains
    # ------------------------------------------------------------------
    key = jax.random.PRNGKey(cfg.seed)
    m = runner.evaluate(seq_ds, action=f"{subject}/{action}/cam{cam_idx}", key=key)
    pred = m["predictions"]  # [N, J, 3] camera space, root-relative (metres)

    cam = dataset.cameras()[subject][cam_idx]
    positions_world = dataset[subject][action]["positions"]
    traj = world_to_camera(positions_world, R=cam["orientation"], t=cam["translation"])[:, :1]
    n = min(len(pred), len(traj), args.viz_limit)

    gt_cam = base.poses_3d[seq_key][:n] + traj[:n]
    pred_cam = pred[:n] + traj[:n]
    gt_world = camera_to_world(gt_cam, R=cam["orientation"], t=cam["translation"])
    pred_world = camera_to_world(pred_cam, R=cam["orientation"], t=cam["translation"])

    parents = dataset.skeleton().parents()
    joints_right = dataset.skeleton().joints_right()

    # Input 2D animation (back to pixel coordinates for display).
    kps_pix = image_coordinates(
        base.poses_2d[seq_key][:n].copy(), w=cam["res_w"], h=cam["res_h"]
    )
    p1 = render_2d_animation(kps_pix, parents, joints_right,
                             os.path.join(args.viz_output, "input_2d.gif"))
    p2 = render_3d_animation(gt_world, pred_world, parents, joints_right,
                             os.path.join(args.viz_output, "reconstruction_3d.gif"),
                             azim=cam.get("azimuth", 70.0))
    p2b = render_2d_figs(kps_pix, parents, joints_right,
                         os.path.join(args.viz_output, "input_2d_frames.png"),
                         frame_indices=[0, n // 2, n - 1])

    # Forward-diffusion chain on the first window's normalised GT.
    item = seq_ds.get_item(0)
    x0 = jnp.asarray(item["gt_3d_norm"])[None]
    fwd_chain, t_list = runner.diffusion.get_noisy_pose(
        x0, num_sample=args.viz_chain_samples, key=key
    )
    fwd = np.asarray(fwd_chain)[0] * seq_ds.scale  # [F, J, 3, S]
    p3 = render_chain_animation(fwd, parents, joints_right,
                                os.path.join(args.viz_output, "forward_diffusion.gif"),
                                titles=[f"t={t}" for t in t_list])

    # Reverse-diffusion chain (x_t states and x0 estimates per DDIM step).
    x2d = jnp.asarray(item["input_2d"])[None]
    _, states, x0_ests = runner.diffusion.ddim_sample_loop(
        runner.state.params, key, x2d,
        (1,) + tuple(x0.shape[1:]), collect_chain=True,
    )
    rev = np.asarray(states)[0] * seq_ds.scale
    p4 = render_chain_animation(rev, parents, joints_right,
                                os.path.join(args.viz_output, "reverse_diffusion.gif"))
    s = rev.shape[-1]
    p5 = render_3d_figs(rev, parents, joints_right,
                        os.path.join(args.viz_output, "reverse_diffusion_steps.png"),
                        step_indices=[0, s // 2, s - 1])
    outputs = [p1, p2, p2b, p3, p4, p5]

    # Multi-hypothesis animation (reference README:79's `-b 4` flow): sample
    # repeat_n independent hypotheses for the first window and render each
    # panel plus their mean with per-frame MPJPE.
    if cfg.repeat_n > 1:
        f_out = x0.shape[1]
        hyps = runner.eval_diffusion.estimate_pose(
            runner.state.params, key, x2d, (1, f_out, x0.shape[2], 3),
            repeat_n=cfg.repeat_n, reduce=False,
        )
        hyps_cam = np.asarray(hyps)[:, 0] * seq_ds.scale  # [H, F, J, 3]
        n_h = min(hyps_cam.shape[1], len(traj), args.viz_limit)
        hyps_world = np.stack([
            camera_to_world(h[:n_h] + traj[:n_h], R=cam["orientation"], t=cam["translation"])
            for h in hyps_cam
        ])
        outputs.append(render_hypotheses_animation(
            gt_world[:n_h], hyps_world, parents, joints_right,
            os.path.join(args.viz_output, "hypotheses_3d.gif"),
            azim=cam.get("azimuth", 70.0),
        ))

    # Pose-over-footage overlay (reference visualization_ani.py:44-63,71-228).
    if args.viz_video:
        frames = read_video(args.viz_video, limit=n, skip=args.viz_video_skip)
        outputs.append(render_video_overlay(
            frames, kps_pix[: frames.shape[0]], parents, joints_right,
            os.path.join(args.viz_output, "video_overlay.gif"),
            prediction=pred_world[: frames.shape[0]],
            gt=gt_world[: frames.shape[0]],
            azim=cam.get("azimuth", 70.0),
        ))

    print("Wrote:", ", ".join(outputs))
    return m


if __name__ == "__main__":
    main()
