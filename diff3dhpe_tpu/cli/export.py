"""AOT serving-export entry point: serialize the flip-TTA DDIM eval step.

The reference has no serving story — evaluation needs the full research
script on the serving host (reference run.py:535-654). Here, one command
turns a config + checkpoint into a self-contained StableHLO artifact that
any jax runtime replays without framework code (see io/export.py):

    python -m diff3dhpe_tpu.cli.export \\
        --config configs/h36m_gt_s2s_...json \\
        --evaluate checkpoint/best_epoch \\
        --output serve/eval.jaxexport \\
        --export-batch-size 16 [--export-platforms tpu,cpu]

Any config-override flag of ``cli.run`` works here too (e.g.
``--number-of-frames``, ``--fast_eval``). For datasets whose joint layout
is not derivable without the data archive (humaneva*, custom*), pass
``--export-num-joints/--export-joints-left/--export-joints-right``.
"""
from __future__ import annotations

import sys


def _dataset_joints(dataset: str):
    """(num_joints, joints_left, joints_right) for archive-free datasets."""
    if dataset == "h36m":
        import copy

        from diff3dhpe_tpu.data.h36m import h36m_skeleton

        sk = copy.deepcopy(h36m_skeleton)
        # Same 32->17 reduction as Human36mDataset (data/h36m.py:223-224);
        # the shoulder rewiring only edits parents, not the symmetry lists.
        sk.remove_joints([4, 5, 9, 10, 11, 16, 20, 21, 22, 23, 24, 28, 29, 30, 31])
        return sk.num_joints(), list(sk.joints_left()), list(sk.joints_right())
    if dataset == "3dhp":
        from diff3dhpe_tpu.data.mpiinf3dhp import JOINTS_LEFT, JOINTS_RIGHT, NUM_JOINTS

        return NUM_JOINTS, list(JOINTS_LEFT), list(JOINTS_RIGHT)
    return None


def main(argv=None):
    from diff3dhpe_tpu.cli.args import args_to_overrides, build_parser
    from diff3dhpe_tpu.config import load_config

    parser = build_parser()
    parser.add_argument("--output", required=True, metavar="PATH",
                        help="where to write the serialized artifact")
    parser.add_argument("--export-batch-size", type=int, default=None, metavar="N",
                        help="fixed batch shape baked into the artifact "
                             "(default: batch_size_eval)")
    parser.add_argument("--export-platforms", type=str, default=None, metavar="LIST",
                        help="comma-separated lowering platforms, e.g. 'tpu' or "
                             "'cpu,tpu' (default: current backend)")
    parser.add_argument("--export-sharded", action="store_true",
                        help="bake the runner's mesh (shard_map data-parallel "
                             "program) into the artifact; requires the same "
                             "device count on the serving host")
    parser.add_argument("--export-num-joints", type=int, default=None)
    parser.add_argument("--export-joints-left", type=str, default=None,
                        help="comma-separated joint indices")
    parser.add_argument("--export-joints-right", type=str, default=None)
    args = parser.parse_args(argv)
    cfg = load_config(args.config, args_to_overrides(args))

    import os

    from diff3dhpe_tpu.engine.runner import Runner
    from diff3dhpe_tpu.io.checkpoint import load_torch_model_params, restore_checkpoint
    from diff3dhpe_tpu.io.export import export_eval_step

    if args.export_num_joints is not None:
        meta = (
            args.export_num_joints,
            [int(s) for s in (args.export_joints_left or "").split(",") if s],
            [int(s) for s in (args.export_joints_right or "").split(",") if s],
        )
    else:
        meta = _dataset_joints(cfg.dataset)
        if meta is None:
            print(
                f"Dataset '{cfg.dataset}' needs its archive for the joint "
                "layout; pass --export-num-joints/--export-joints-left/"
                "--export-joints-right explicitly."
            )
            sys.exit(1)
    num_joints, joints_left, joints_right = meta

    runner = Runner(cfg, num_joints, joints_left, joints_right)
    runner.set_params(runner.init_params())

    # Weight loading, identical semantics to cli/run.py.
    ckpt = cfg.evaluate or cfg.pretrained_model
    if ckpt:
        path = (os.path.join(cfg.checkpoint, ckpt)
                if not os.path.exists(ckpt) else ckpt)
        if path.endswith(".bin"):
            runner.set_params(load_torch_model_params(
                path, depth=cfg.transformer_depth,
                with_time_emb=cfg.with_time_emb,
                mode="s2s" if cfg.out_all else "s2f",
            ))
        else:
            runner.state, _ = restore_checkpoint(path, runner.state)
        print(f"Loaded checkpoint {path}")
    else:
        print("WARNING: exporting freshly-initialised weights "
              "(no --evaluate/--pretrained_model given)")

    batch = args.export_batch_size or cfg.batch_size_eval
    platforms = (
        [p.strip() for p in args.export_platforms.split(",") if p.strip()]
        if args.export_platforms else None
    )
    data = export_eval_step(runner, batch_size=batch, platforms=platforms,
                            path=args.output, sharded=args.export_sharded)
    print(
        f"Exported eval step -> {args.output} ({len(data)} bytes): "
        f"eval(params, key, x2d, x2d_flip) with x2d "
        f"[{batch}, {cfg.number_of_frames}, {num_joints}, 2], "
        f"platforms={platforms or 'current backend'}"
    )


if __name__ == "__main__":
    main()
