"""Flagship-geometry parity run (VERDICT round-3 Next #2).

All reference-parity tests run at toy shapes (embed 64, depth 2, F=9 —
tests/test_model.py, tests/test_reference_e2e_parity.py); this script
closes the extrapolation gap by measuring, at the FLAGSHIP shape
(F=243, J=17, embed 512, depth 8, heads 8 — reference
configs/h36m_gt_...json, model_..._s2s_grand_linLift.py:139-257):

  1. single-forward deviation:  torch reference (host CPU, f64-free f32)
     vs flax-f32-highest and the fused kernels (mxhighest / mxdefault);
  2. end-to-end DDIM-9 deviation (T=1000, clip_denoised, identical x_T
     injected into the torch loop via monkeypatched randn — the same
     harness as tests/test_reference_e2e_parity.py, reference
     diff_s2s.py:263-300).

Weights are a RANDOM-INIT reference state_dict (seed 0) converted through
io/torch_convert.py — real released checkpoints are not in this image
(VERDICT Missing #1), but parity of the computation graph is
checkpoint-independent. Deviations are reported in mm at metre scale
(1e-3 units = 1 mm), the same convention as the toy-shape e2e test.

Each jax variant runs in its own subprocess (a clean jit cache per
contraction mode; precision is pinned per-callable via
make_fast_denoise_fn(f32_prec=...)); the torch leg is torch-only. Results accumulate in
scripts/flagship_parity_out/*.npz and the combined table is written to
scripts/flagship_parity.json. Safe to re-run after a relay wedge: finished
legs are reused. Run via the watchdog:

  bash scripts/tpu_watchdog.sh /tmp/flagship_parity.log 2400 4 \
      python scripts/flagship_parity.py
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAMES = int(os.environ.get("FP_FRAMES", "243"))
JOINTS, EMBED, DEPTH, HEADS = 17, 512, 8, 8
TIMESTEPS, DDIM = 1000, int(os.environ.get("FP_DDIM", "9"))
BATCH = int(os.environ.get("FP_BATCH", "1"))
HERE = os.path.dirname(os.path.abspath(__file__))
OUTDIR = os.path.join(HERE, "flagship_parity_out")
OUT = os.path.join(HERE, "flagship_parity.json")
REFERENCE_DIR = "/root/reference"

# Forward-parity diffusion times (the DDIM-9 grid spans ~0..999).
T_PROBE = [0.0, 500.0, 999.0]


def fixed_inputs():
    rng = np.random.default_rng(5)
    cond = rng.standard_normal((BATCH, FRAMES, JOINTS, 2)).astype(np.float32)
    x_t = rng.standard_normal((BATCH, FRAMES, JOINTS, 3)).astype(np.float32)
    fwd_in = rng.standard_normal((BATCH, FRAMES, JOINTS, 5)).astype(np.float32)
    return cond, x_t, fwd_in


def _stub_timm():
    """The reference imports timm only for DropPath (inactive at eval)."""
    import types

    import torch

    if "timm" in sys.modules:
        return
    timm = types.ModuleType("timm")
    models_mod = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()

        def forward(self, x):
            return x

    layers.DropPath = DropPath
    models_mod.layers = layers
    timm.models = models_mod
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models_mod
    sys.modules["timm.models.layers"] = layers


def build_reference_model():
    import torch

    _stub_timm()
    sys.path.insert(0, REFERENCE_DIR)
    from common.nets.model_conditional_diffusion_mixste_s2s_grand_linLift import (
        ConditionalDiffusionMixSTES2SGRANDLinLift,
    )

    torch.manual_seed(0)
    model = ConditionalDiffusionMixSTES2SGRANDLinLift(
        num_frame=FRAMES, num_joints=JOINTS, in_chans=2, embed_dim=EMBED,
        depth=DEPTH, num_heads=HEADS, mlp_ratio=2.0, qkv_bias=True,
        drop_path_rate=0.1, with_time_emb=True,
    )
    model.eval()
    return model


def state_dict_path():
    return os.path.join(OUTDIR, "ref_state_dict.pt")


def run_torch_leg():
    """Reference model on host CPU: forward probes + the DDIM-9 loop with
    injected x_T. Also saves the state_dict for the jax legs."""
    import torch

    model = build_reference_model()
    from common.conditional_diffusion_ddim_normal_directPredict_variableLoss_both_crossFrames import (  # noqa: E501
        GaussianDiffusion as RefGaussianDiffusion,
    )

    diff = RefGaussianDiffusion(
        model=model, timesteps=TIMESTEPS, sampling_timesteps=DDIM,
        loss_type="l2", clip_denoised=True, beta_schedule="cosine",
        ddim_sampling_eta=0.0,
    )
    diff.eval()

    cond, x_t, fwd_in = fixed_inputs()
    with torch.no_grad():
        fwd = np.stack([
            model.forward_denoise(
                torch.from_numpy(fwd_in), torch.full((BATCH,), t)
            ).numpy()
            for t in T_PROBE
        ])

    orig_randn = torch.randn

    def fixed_randn(*shape, **kwargs):
        s = tuple(shape[0] if isinstance(shape[0], (list, tuple)) else shape)
        if s == x_t.shape:
            return torch.from_numpy(x_t.copy())
        return orig_randn(*shape, **kwargs)

    torch.randn = fixed_randn
    try:
        with torch.no_grad():
            ddim = diff.ddim_sample_loop(
                torch.from_numpy(cond), list(x_t.shape)
            ).numpy()
    finally:
        torch.randn = orig_randn

    torch.save(model.state_dict(), state_dict_path())
    np.savez(os.path.join(OUTDIR, "torch.npz"), fwd=fwd, ddim=ddim)
    print(f"torch leg done: fwd {fwd.shape}, ddim {ddim.shape}")


def run_jax_leg(name: str, fast: bool, f32_prec: str | None,
                mixed: bool = False):
    import jax
    import jax.numpy as jnp
    import torch

    from diff3dhpe_tpu.diffusion import GaussianDiffusion
    from diff3dhpe_tpu.engine import make_denoise_fn
    from diff3dhpe_tpu.io import convert_torch_state_dict
    from diff3dhpe_tpu.models import MixSTEDenoiser

    jax.config.update("jax_default_matmul_precision", "highest")
    state = torch.load(state_dict_path(), map_location="cpu")
    params = convert_torch_state_dict(state, depth=DEPTH)

    model = MixSTEDenoiser(
        num_frame=FRAMES, num_joints=JOINTS, in_chans=2, embed_dim=EMBED,
        depth=DEPTH, num_heads=HEADS, mlp_ratio=2.0, qkv_bias=True,
        with_time_emb=True, mode="s2s",
    )
    final_denoise_fn = None
    if fast:
        from diff3dhpe_tpu.engine.steps import make_fast_denoise_fn

        fast_kwargs = dict(
            num_frame=FRAMES, num_joints=JOINTS, depth=DEPTH,
            num_heads=HEADS, with_time_emb=True, mode="s2s",
        )
        if mixed:
            # The mixed eval path: bf16 trunk + f32 head epilogue, last DDIM
            # step through the f32 fused forward with contraction mode
            # f32_prec ("highest" = 6-pass exact, "high3" = bf16x3 — the
            # promoted default; scripts/accuracy_study.py fast_mixed1_*).
            denoise_fn = make_fast_denoise_fn(
                dtype=jnp.bfloat16, f32_head=True, **fast_kwargs
            )
            final_denoise_fn = make_fast_denoise_fn(
                dtype=jnp.float32, f32_prec=f32_prec, **fast_kwargs
            )
        else:
            denoise_fn = make_fast_denoise_fn(
                dtype=jnp.float32, f32_prec=f32_prec, **fast_kwargs
            )
    else:
        denoise_fn = make_denoise_fn(model)
    diffusion = GaussianDiffusion.create(
        denoise_fn, timesteps=TIMESTEPS, sampling_timesteps=DDIM,
        clip_denoised=True, beta_schedule="cosine", ddim_sampling_eta=0.0,
        mode="s2s",
    )
    if final_denoise_fn is not None:
        import dataclasses as _dc

        diffusion = _dc.replace(
            diffusion, final_denoise_fn=final_denoise_fn,
            final_denoise_steps=1,
        )

    cond, x_t, fwd_in = fixed_inputs()
    fwd_fn = jax.jit(lambda p, x, t: denoise_fn(p, x, t, None))
    fwd = np.stack([
        np.asarray(fwd_fn(params, jnp.asarray(fwd_in),
                          jnp.full((BATCH,), t, jnp.float32)))
        for t in T_PROBE
    ])
    print(f"{name}: forward probes done", flush=True)
    ddim = np.asarray(
        jax.jit(
            lambda p, c, xi: diffusion.ddim_sample_loop(
                p, jax.random.PRNGKey(0), c, x_t.shape, x_init=xi
            )
        )(params, jnp.asarray(cond), jnp.asarray(x_t))
    )
    np.savez(os.path.join(OUTDIR, f"{name}.npz"), fwd=fwd, ddim=ddim)
    print(f"{name} leg done")


LEGS = [
    # (name, kind, fast, f32_prec [make_fast_denoise_fn f32_prec — the
    # final step's for mixed legs], mixed)
    ("torch", "torch", False, None, False),
    ("flax_f32", "jax", False, None, False),
    ("fast_f32_mxhighest", "jax", True, "highest", False),
    ("fast_f32_mxdefault", "jax", True, "default", False),
    # bf16 trunk + f32 head + 1 f32 final DDIM step at HIGHEST / high3
    # (bf16x3) contract — the round-4 mixed eval candidates
    # (scripts/accuracy_study.py fast_mixed1_hx / fast_mixed1_h3).
    ("fast_mixed1_hx", "jax", True, "highest", True),
    ("fast_mixed1_h3", "jax", True, "high3", True),
]


def main():
    os.makedirs(OUTDIR, exist_ok=True)
    leg = os.environ.get("FP_LEG")
    if leg:
        spec = next(l for l in LEGS if l[0] == leg)
        if spec[1] == "torch":
            run_torch_leg()
        else:
            run_jax_leg(spec[0], spec[2], spec[3], mixed=spec[4])
        return

    import subprocess
    for name, *_ in LEGS:
        if os.path.isfile(os.path.join(OUTDIR, f"{name}.npz")):
            print(f"{name}: reusing existing npz")
            continue
        env = dict(os.environ, FP_LEG=name)
        r = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env)
        if r.returncode != 0:
            raise RuntimeError(f"leg {name} failed rc={r.returncode}")

    ref = np.load(os.path.join(OUTDIR, "torch.npz"))
    table = dict(
        config=dict(frames=FRAMES, joints=JOINTS, embed=EMBED, depth=DEPTH,
                    heads=HEADS, timesteps=TIMESTEPS, ddim=DDIM, batch=BATCH,
                    weights="random-init reference state_dict (seed 0), "
                            "converted via io/torch_convert.py"),
        units="mm at metre scale (1e-3 model units)",
        legs={},
    )
    for name, kind, *_ in LEGS:
        if kind == "torch":
            continue
        z = np.load(os.path.join(OUTDIR, f"{name}.npz"))
        d_fwd = np.abs(z["fwd"] - ref["fwd"])
        d_ddim = np.abs(z["ddim"] - ref["ddim"])
        table["legs"][name] = dict(
            fwd_max_dev_mm=round(float(d_fwd.max()) * 1000.0, 6),
            fwd_mean_dev_mm=round(float(d_fwd.mean()) * 1000.0, 6),
            ddim9_max_dev_mm=round(float(d_ddim.max()) * 1000.0, 6),
            ddim9_mean_dev_mm=round(float(d_ddim.mean()) * 1000.0, 6),
            ddim9_mean_joint_dev_mm=round(
                float(np.linalg.norm(z["ddim"] - ref["ddim"], axis=-1).mean())
                * 1000.0, 6,
            ),
        )
    with open(OUT, "w") as f:
        json.dump(table, f, indent=2)
    print(json.dumps(table, indent=2))


if __name__ == "__main__":
    main()
