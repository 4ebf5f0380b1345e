"""One command -> the MPJPE-vs-published table, for when real data lands.

The H3.6M / MPI-INF-3DHP archives and the reference's released ``.bin``
checkpoints are not redistributable and are absent from this image; the
chain that consumes them is proven in miniature by
tests/test_real_data_chain.py. This script is the production form of that
chain: point it at a data directory and a checkpoint directory and it
evaluates every published row through the real loaders + the torch-
checkpoint converter, printing achieved vs published numbers side by side
(reference README.md:14-53; eval recipes Experiments.sh — DDIM steps per
row below; the CPN-243f / GT-81f recipes are not published, both default
to the 81f protocol's DDIM-9 and are knob-overridable).

Usage (expects the VideoPose3D-style npz layout prepare_h36m.py emits):
    python scripts/published_eval.py --data-root data/ --ckpt-dir checkpoint/released/
    python scripts/published_eval.py --rows h36m_gt_243  # subset
    python scripts/published_eval.py --fast-eval         # fused kernels

Checkpoints may be the reference's released .bin files (converted on the
fly by io/checkpoint.py::load_torch_model_params) or this framework's own
orbax directories; missing files are reported and skipped so partial drops
still produce a partial table. Writes scripts/published_eval.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_BIN = "ConditionalDiffusionMixSTES2SGRANDLinLift_l2_lr4e-4"

# name -> (cli, config, keypoints, frames, eval_ddim, released_bin, published)
ROWS = {
    "h36m_cpn_81": (
        "run", "configs/h36m_cpn_s2s_ConditionalDiffusionMixSTES2SGRANDLinLift.json",
        "cpn_ft_h36m_dbb", 81, 9, f"{_BIN}_useTembed_T_h36m_cpn_81f.bin",
        {"mpjpe_mm": 42.0},
    ),
    "h36m_cpn_243": (
        "run", "configs/h36m_cpn_s2s_ConditionalDiffusionMixSTES2SGRANDLinLift.json",
        "cpn_ft_h36m_dbb", 243, 9, f"{_BIN}_useTembed_T_h36m_cpn_243f.bin",
        {"mpjpe_mm": 40.0},
    ),
    "h36m_gt_81": (
        "run", "configs/h36m_gt_s2s_ConditionalDiffusionMixSTES2SGRANDLinLift.json",
        "gt", 81, 9, f"{_BIN}_useTembed_T_h36m_gt_81f.bin",
        {"mpjpe_mm": 24.2},
    ),
    "h36m_gt_243": (
        "run", "configs/h36m_gt_s2s_ConditionalDiffusionMixSTES2SGRANDLinLift.json",
        "gt", 243, 6, f"{_BIN}_useTembed_T_h36m_gt_243f.bin",
        {"mpjpe_mm": 20.2},
    ),
    "3dhp_gt_27": (
        "run_3dhp", "configs/3dhp_gt_s2s_ConditionalDiffusionMixSTES2SGRANDLinLift.json",
        "gt", 27, 7, f"{_BIN}_useTembed_F_3dhp_gt_27f.bin",
        {"pck_pct": 99.1, "auc_pct": 84.8, "mpjpe_mm": 19.6},
    ),
}
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "published_eval.json")


def eval_row(name, data_root, ckpt_dir, batch_eval, fast_eval, ddim_override=None,
             extra_args=()):
    cli, config, keypoints, frames, ddim, bin_name, published = ROWS[name]
    ckpt = os.path.join(ckpt_dir, bin_name)
    if not os.path.isfile(ckpt):
        orbax = os.path.join(ckpt_dir, name, "best_epoch")
        if os.path.isdir(orbax):
            ckpt = orbax
        else:
            return dict(status="missing_checkpoint", needed=[ckpt, orbax])
    if cli == "run":
        data_files = [
            os.path.join(data_root, "data_3d_h36m.npz"),
            os.path.join(data_root, f"data_2d_h36m_{keypoints}.npz"),
        ]
    else:
        data_files = [
            os.path.join(data_root, "data_train_3dhp.npz"),
            os.path.join(data_root, "data_test_3dhp.npz"),
        ]
    missing = [p for p in data_files if not os.path.isfile(p)]
    if missing:
        return dict(status="missing_data", needed=missing)

    argv = [
        "--config", config, "--data-root", data_root,
        "-c", os.path.join(ckpt_dir, f"_eval_{name}"),
        "--keypoints", keypoints,
        "--number-of-frames", str(frames), "--stride", str(frames),
        "--sampling_timesteps", str(ddim_override or ddim),
        "--batch-size-eval", str(batch_eval),
        "--evaluate", ckpt,
    ]
    if fast_eval:
        argv.append("--fast-eval")
    argv.extend(extra_args)

    if cli == "run":
        from diff3dhpe_tpu.cli.run import main as run_main

        errors = run_main(argv)
        achieved = {"mpjpe_mm": round(float(np.mean(errors["e1"])), 2)}
    else:
        from diff3dhpe_tpu.cli.run_3dhp import main as run_3dhp_main

        res = run_3dhp_main(argv)
        achieved = {
            "pck_pct": round(res["pck"], 2),
            "auc_pct": round(res["auc"], 2),
            "mpjpe_mm": round(float(np.mean(res["errors"]["e1"])), 2),
        }
    deltas = {k: round(achieved[k] - published[k], 3) for k in published}
    return dict(status="ok", achieved=achieved, published=published,
                delta_vs_published=deltas, checkpoint=ckpt,
                eval_ddim=ddim_override or ddim)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--ckpt-dir", default="checkpoint/released")
    ap.add_argument("--rows", default=",".join(ROWS))
    ap.add_argument("--batch-size-eval", type=int, default=256)
    ap.add_argument("--fast-eval", action="store_true",
                    help="fused Pallas eval kernels (accuracy-gated path)")
    ap.add_argument("--ddim", type=int, default=None,
                    help="override the per-row eval DDIM step count")
    ap.add_argument("--out", default=OUT, help="output JSON path")
    # Unknown flags pass through to the row CLI (e.g. --embed_dim 32
    # --transformer_depth 1 for a miniature plumbing check, or --actions).
    args, extra = ap.parse_known_args(argv)

    table = {}
    for name in args.rows.split(","):
        name = name.strip()
        if name not in ROWS:
            raise SystemExit(f"unknown row {name!r}; rows: {list(ROWS)}")
        print(f"=== {name} ===")
        try:
            table[name] = eval_row(
                name, args.data_root, args.ckpt_dir, args.batch_size_eval,
                args.fast_eval, args.ddim, extra,
            )
        except Exception as e:  # a bad row must not lose the finished ones
            table[name] = dict(status="error", error=f"{type(e).__name__}: {e}")
        print(json.dumps(table[name], indent=2))
        with open(args.out, "w") as f:  # incremental: partial drops keep rows
            json.dump(table, f, indent=2)

    print(f"\n{'row':<14}{'metric':<10}{'published':>10}{'achieved':>10}{'delta':>8}")
    for name, row in table.items():
        if row["status"] != "ok":
            why = row.get("error") or f"needs {row['needed'][0]}"
            print(f"{name:<14}{row['status']} ({why})")
            continue
        for k, pub in row["published"].items():
            print(f"{name:<14}{k:<10}{pub:>10}{row['achieved'][k]:>10}"
                  f"{row['delta_vs_published'][k]:>8}")
    return table


if __name__ == "__main__":
    main()
