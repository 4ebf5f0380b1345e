"""MixSTE denoiser tests: shapes, determinism, and numerical parity against
the reference PyTorch model (loaded from /root/reference with converted
weights) when the reference tree is present."""
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff3dhpe_tpu.models import MixSTEDenoiser, HPE_model
from diff3dhpe_tpu.io import convert_torch_state_dict

from conftest import has_reference, REFERENCE_DIR


def make_model(mode="s2s", with_time_emb=True, num_frame=9, embed_dim=32, depth=2):
    return MixSTEDenoiser(
        num_frame=num_frame,
        num_joints=17,
        in_chans=2,
        embed_dim=embed_dim,
        depth=depth,
        num_heads=8,
        mlp_ratio=2.0,
        qkv_bias=True,
        drop_path_rate=0.1,
        with_time_emb=with_time_emb,
        mode=mode,
    )


@pytest.mark.parametrize("mode,out_frames", [("s2s", 9), ("s2f", 1)])
def test_output_shape(mode, out_frames):
    model = make_model(mode=mode)
    x = jnp.zeros((2, 9, 17, 5))
    t = jnp.zeros((2,))
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    out = model.apply({"params": params}, x, t)
    assert out.shape == (2, out_frames, 17, 3)


def test_no_time_emb():
    model = make_model(with_time_emb=False)
    x = jnp.ones((1, 9, 17, 5))
    t = jnp.zeros((1,))
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    assert "time_mlp_1" not in params
    out = model.apply({"params": params}, x, t)
    assert out.shape == (1, 9, 17, 3)


def test_time_embedding_changes_output():
    model = make_model()
    x = jnp.ones((1, 9, 17, 5))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))["params"]
    out0 = model.apply({"params": params}, x, jnp.array([0.0]))
    out500 = model.apply({"params": params}, x, jnp.array([500.0]))
    assert not np.allclose(out0, out500)


def test_dropout_and_droppath_train_vs_eval():
    model = MixSTEDenoiser(
        num_frame=9, embed_dim=32, depth=2, drop_rate=0.1, drop_path_rate=0.5
    )
    x = jnp.ones((4, 9, 17, 5))
    t = jnp.zeros((4,))
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    eval_out = model.apply({"params": params}, x, t, deterministic=True)
    train_out = model.apply(
        {"params": params}, x, t, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert not np.allclose(eval_out, train_out)
    # Eval path is deterministic.
    eval_out2 = model.apply({"params": params}, x, t, deterministic=True)
    np.testing.assert_array_equal(eval_out, eval_out2)


def test_registry():
    cls = HPE_model("ConditionalDiffusionMixSTES2SGRANDLinLift")
    m = cls(num_frame=9, embed_dim=32, depth=1)
    assert m.mode == "s2s"
    cls2 = HPE_model("ConditionalDiffusionMixSTES2FGRANDLinLift")
    assert cls2(num_frame=9, embed_dim=32, depth=1).mode == "s2f"
    with pytest.raises(KeyError):
        HPE_model("nope")


# ---------------------------------------------------------------------------
# Parity vs the reference PyTorch implementation
# ---------------------------------------------------------------------------

def _import_reference_models():
    """Import the reference model modules with a minimal timm stub."""
    torch = pytest.importorskip("torch")
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        class DropPath(torch.nn.Module):
            def __init__(self, drop_prob=None):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):  # identity at eval; tests never train it
                return x

        layers.DropPath = DropPath
        models.layers = layers
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    from common.nets.model_conditional_diffusion_mixste_s2s_grand_linLift import (
        ConditionalDiffusionMixSTES2SGRANDLinLift,
    )
    from common.nets.model_conditional_diffusion_mixste_s2f_grand_linLift import (
        ConditionalDiffusionMixSTES2FGRANDLinLift,
    )
    return ConditionalDiffusionMixSTES2SGRANDLinLift, ConditionalDiffusionMixSTES2FGRANDLinLift


@pytest.mark.skipif(not has_reference(), reason="reference tree not available")
@pytest.mark.parametrize("mode,with_time_emb", [("s2s", True), ("s2s", False), ("s2f", True)])
def test_forward_parity_with_reference(mode, with_time_emb):
    torch = pytest.importorskip("torch")
    S2S, S2F = _import_reference_models()
    torch.manual_seed(0)

    F, J, C, depth = 9, 17, 64, 2
    cls = S2S if mode == "s2s" else S2F
    ref = cls(
        num_frame=F, num_joints=J, in_chans=2, embed_dim=C, depth=depth,
        num_heads=8, mlp_ratio=2.0, qkv_bias=True, qk_scale=None,
        drop_path_rate=0.1, with_time_emb=with_time_emb,
    )
    ref.eval()

    params = convert_torch_state_dict(
        ref.state_dict(), depth=depth, with_time_emb=with_time_emb, mode=mode
    )
    model = MixSTEDenoiser(
        num_frame=F, num_joints=J, in_chans=2, embed_dim=C, depth=depth,
        num_heads=8, mlp_ratio=2.0, qkv_bias=True,
        drop_path_rate=0.1, with_time_emb=with_time_emb, mode=mode,
    )

    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, F, J, 5)).astype(np.float32)
    t = np.array([0.0, 250.0, 999.0], dtype=np.float32)

    with torch.no_grad():
        ref_out = ref.forward_denoise(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x), jnp.asarray(t)))

    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=2e-5)


@pytest.mark.skipif(not has_reference(), reason="reference tree not available")
def test_param_count_matches_reference():
    torch = pytest.importorskip("torch")
    S2S, _ = _import_reference_models()
    F, J, C, depth = 27, 17, 512, 8
    ref = S2S(num_frame=F, num_joints=J, in_chans=2, embed_dim=C, depth=depth,
              num_heads=8, mlp_ratio=2.0, qkv_bias=True, with_time_emb=True)
    ref_count = sum(p.numel() for p in ref.parameters())

    model = MixSTEDenoiser(num_frame=F, num_joints=J, in_chans=2, embed_dim=C,
                           depth=depth, num_heads=8, mlp_ratio=2.0, qkv_bias=True,
                           with_time_emb=True, mode="s2s")
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, F, J, 5)), jnp.zeros((1,))
    )["params"]
    ours_count = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert ours_count == ref_count


def test_bf16_activation_path_close_to_f32():
    """bf16 compute path stays within bf16-expected error of f32 (the fast
    eval configuration; schedule math and params remain f32)."""
    import jax.numpy as jnp

    kwargs = dict(num_frame=9, num_joints=17, in_chans=2, embed_dim=64, depth=2,
                  num_heads=8, mlp_ratio=2.0, qkv_bias=True, with_time_emb=True,
                  mode="s2s")
    m32 = MixSTEDenoiser(**kwargs)
    m16 = MixSTEDenoiser(dtype=jnp.bfloat16, **kwargs)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 9, 17, 5)), jnp.float32)
    t = jnp.array([0.0, 400.0])
    params = m32.init(jax.random.PRNGKey(0), x, t)["params"]
    out32 = np.asarray(m32.apply({"params": params}, x, t))
    out16 = np.asarray(m16.apply({"params": params}, x, t), dtype=np.float32)
    # bf16 has ~3 decimal digits; depth-2 error accumulation ~1e-2 relative.
    scale = np.abs(out32).max()
    assert np.abs(out16 - out32).max() / scale < 5e-2


@pytest.mark.skipif(not has_reference(), reason="reference tree not available")
@pytest.mark.parametrize("mode", ["s2s", "s2f"])
def test_torch_state_dict_round_trip(mode):
    """The jax->torch inverse converter (io/torch_convert.py::
    convert_params_to_torch_state_dict) must load STRICTLY into the bare
    reference model and round-trip back to the identical param tree — the
    converter pair that closes the trained-weight torch-vs-jax parity
    chain (scripts/torch_parity.py)."""
    torch = pytest.importorskip("torch")
    from diff3dhpe_tpu.io.torch_convert import convert_params_to_torch_state_dict

    S2S, S2F = _import_reference_models()
    F, J, C, depth = 9, 17, 64, 2
    model = MixSTEDenoiser(
        num_frame=F, num_joints=J, in_chans=2, embed_dim=C, depth=depth,
        num_heads=8, mlp_ratio=2.0, qkv_bias=True,
        drop_path_rate=0.1, with_time_emb=True, mode=mode,
    )
    x = jnp.zeros((1, F, J, 5))
    params = model.init(jax.random.PRNGKey(3), x, jnp.zeros((1,)))["params"]

    sd = convert_params_to_torch_state_dict(
        params, depth=depth, with_time_emb=True, mode=mode
    )
    cls = S2S if mode == "s2s" else S2F
    ref = cls(
        num_frame=F, num_joints=J, in_chans=2, embed_dim=C, depth=depth,
        num_heads=8, mlp_ratio=2.0, qkv_bias=True, qk_scale=None,
        drop_path_rate=0.1, with_time_emb=True,
    )
    # strict load: every reference parameter must be covered, no extras.
    ref.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()}, strict=True)
    ref.eval()

    # Round-trip back and compare every leaf bit-exactly.
    back = convert_torch_state_dict(
        ref.state_dict(), depth=depth, with_time_emb=True, mode=mode
    )
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_b[path]))

    # And the torch forward on the loaded weights matches the flax forward.
    rng = np.random.default_rng(5)
    xin = rng.standard_normal((2, F, J, 5)).astype(np.float32)
    t = np.array([10.0, 800.0], dtype=np.float32)
    with torch.no_grad():
        ref_out = ref.forward_denoise(torch.from_numpy(xin), torch.from_numpy(t)).numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(xin), jnp.asarray(t)))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=2e-5)
