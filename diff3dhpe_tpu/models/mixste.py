"""MixSTE spatio-temporal transformer denoiser (flax.linen).

One module covers both output modes of the reference:
- mode="s2s": per-frame 3D output [B, F, J, 3] (reference:
  common/nets/model_conditional_diffusion_mixste_s2s_grand_linLift.py:139-257)
- mode="s2f": single-frame output [B, 1, J, 3] via a learned weighted mean
  over frames (reference: .../model_..._s2f_grand_linLift.py:216-264) —
  the two reference files differ only in that head.

Architecture per denoise call (x: [B, F, J, 5] = 2D xy ++ noisy 3D xyz):
  fusion Dense 5->C
  time embedding: sinusoidal(C) -> Dense 2C -> GELU -> Dense 2C
  depth x [ spatial block over joints  -> LayerNorm,
            temporal block over frames -> LayerNorm ]
  (learned spatial/temporal positional embeddings added before block 0's
   respective attention, matching reference ST_foward:222-247)
  head: LayerNorm -> Dense C->3

Each block adds a SiLU->Dense projection of the time embedding, pre-norm
attention with the GRAND (attn - I) @ V modification, and a pre-norm MLP,
with DropPath (stochastic depth, rate linspace(0, r, depth)) at train time.

TPU notes: the spatial attention runs over N=J (17) tokens with B*F batch
rows and the temporal attention over N=F (27..243) tokens with B*J rows —
both map to batched [N, N] x [N, 64] matmuls that XLA tiles onto the MXU.
The (attn - I)V term is computed as attn@V - V (no identity materialised).
All reshapes are layout-friendly: (B F J C) -> (B*F, J, C) is free; the
temporal split transposes F and J once per block pair.

Weight init follows torch.nn.Linear defaults (uniform +-1/sqrt(fan_in) for
kernel and bias) so from-scratch training matches the reference's dynamics;
positional embeddings init to zeros as in the reference.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diff3dhpe_tpu.ops.attention import fused_grand_attention, grand_attention


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear kernel init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    flax Dense kernels are [fan_in, fan_out].
    """
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchDense(nn.Module):
    """Dense layer with torch.nn.Linear's default initialisation."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", torch_linear_kernel_init, (fan_in, self.features), jnp.float32
        )
        y = jnp.dot(x.astype(self.dtype or x.dtype), kernel.astype(self.dtype or kernel.dtype))
        if self.use_bias:
            bias = self.param("bias", make_torch_bias_init(fan_in), (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


def sinusoidal_pos_emb(t, dim: int):
    """Diffusion-time sinusoidal embedding (reference: SinusoidalPosEmb:24-36).

    t: [B] float; returns [B, dim] = concat(sin, cos) over dim//2 frequencies.
    """
    half_dim = dim // 2
    emb_scale = math.log(10000) / (half_dim - 1)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb_scale)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class Mlp(nn.Module):
    hidden_features: int
    out_features: int
    drop: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = TorchDense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dropout(rate=self.drop)(x, deterministic=deterministic)
        x = TorchDense(self.out_features, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(rate=self.drop)(x, deterministic=deterministic)
        return x


class GrandAttention(nn.Module):
    """Multi-head self-attention with the GRAND (attn - I) V modification."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_pallas: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # x: [B, N, C]
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale or head_dim ** -0.5

        qkv = TorchDense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))  # [3, B, H, N, hd]
        q, k, v = qkv[0], qkv[1], qkv[2]

        if self.attn_drop > 0.0 and not deterministic:
            # Dropout on attention probabilities requires the materialised
            # matrix; only taken on the (never-shipped) attn_drop > 0 path.
            logits = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
            attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
            attn = nn.Dropout(rate=self.attn_drop)(attn, deterministic=deterministic)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v) - v
        elif self.use_pallas:
            out = fused_grand_attention(q, k, v, scale=scale)
        else:
            out = grand_attention(q, k, v, scale=scale)

        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, c)
        out = TorchDense(self.dim, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(rate=self.proj_drop)(out, deterministic=deterministic)
        return out


class DropPath(nn.Module):
    """Stochastic depth: drop the residual branch per sample at train time."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep_prob = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep_prob, shape)
        return jnp.where(mask, x / keep_prob, jnp.zeros_like(x))


class Block(nn.Module):
    """Pre-norm transformer block with per-block diffusion-time injection.

    Operates on [B, F, J, C]; `is_spatial` selects whether attention mixes
    joints (per frame) or frames (per joint). Reference: Block:90-135.
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 2.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    with_time_emb: bool = True
    use_pallas: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, is_spatial: bool, time_emb=None, deterministic: bool = True):
        b, f, p, c = x.shape
        if self.with_time_emb and time_emb is not None:
            t = TorchDense(self.dim, dtype=self.dtype, name="time_proj")(jax.nn.silu(time_emb))
            x = x + t[:, None, None, :]

        if is_spatial:
            tokens = x.reshape(b * f, p, c)
        else:
            tokens = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * p, f, c)

        attn = GrandAttention(
            dim=self.dim,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
            name="attn",
        )
        mlp = Mlp(
            hidden_features=int(self.dim * self.mlp_ratio),
            out_features=self.dim,
            drop=self.drop,
            dtype=self.dtype,
            name="mlp",
        )
        drop_path = DropPath(rate=self.drop_path)

        norm1 = nn.LayerNorm(epsilon=1e-6, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-6, name="norm2")

        tokens = tokens + drop_path(
            attn(norm1(tokens), deterministic=deterministic), deterministic=deterministic
        )
        tokens = tokens + drop_path(
            mlp(norm2(tokens), deterministic=deterministic), deterministic=deterministic
        )

        if is_spatial:
            return tokens.reshape(b, f, p, c)
        return jnp.transpose(tokens.reshape(b, p, f, c), (0, 2, 1, 3))


class MixSTEDenoiser(nn.Module):
    """Conditional-diffusion MixSTE denoiser with GRAND attention + linear lift.

    forward: x [B, F, J, in_chans + 3] (2D condition ++ noisy 3D), time [B]
    -> [B, F, J, 3] (mode="s2s") or [B, 1, J, 3] (mode="s2f").
    """

    num_frame: int = 9
    num_joints: int = 17
    in_chans: int = 2
    embed_dim: int = 32
    depth: int = 4
    num_heads: int = 8
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    with_time_emb: bool = True
    mode: str = "s2s"  # "s2s" | "s2f"
    out_dim: int = 3
    use_pallas: bool = False
    dtype: Optional[jnp.dtype] = None
    # Per-BLOCK rematerialisation: each of the 2*depth transformer blocks
    # is its own jax.checkpoint region, so backprop stores only the block
    # boundary activations and recomputes one block at a time — same +1
    # forward of FLOPs as whole-graph remat, but the backward's working
    # set is one block instead of the whole net (whole-graph checkpoint
    # re-builds ALL activations at once before backprop). Param tree is
    # unchanged (nn.remat is transparent to module naming).
    remat_blocks: bool = False

    @nn.compact
    def __call__(self, x, time, deterministic: bool = True):
        assert x.ndim == 4, "expected [B, F, J, C]"
        b, f, p, _ = x.shape
        c = self.embed_dim
        # static_argnums count self as 0: (x=1, is_spatial=2, time_emb=3,
        # deterministic=4) — is_spatial and deterministic are Python bools.
        block_cls = (nn.remat(Block, static_argnums=(2, 4))
                     if self.remat_blocks else Block)

        x = TorchDense(c, dtype=self.dtype, name="fusion_layer")(x)

        if self.with_time_emb:
            t = sinusoidal_pos_emb(time, c)
            t = TorchDense(c * 2, dtype=self.dtype, name="time_mlp_1")(t)
            t = jax.nn.gelu(t, approximate=False)
            t = TorchDense(c * 2, dtype=self.dtype, name="time_mlp_2")(t)
        else:
            t = None

        spatial_pos = self.param(
            "spatial_pos_embed", nn.initializers.zeros, (1, self.num_joints, c), jnp.float32
        )
        temporal_pos = self.param(
            "temporal_pos_embed", nn.initializers.zeros, (1, self.num_frame, c), jnp.float32
        )

        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        pos_drop = nn.Dropout(rate=self.drop_rate)
        spatial_norm = nn.LayerNorm(epsilon=1e-6, name="spatial_norm")
        temporal_norm = nn.LayerNorm(epsilon=1e-6, name="temporal_norm")

        for i in range(self.depth):
            if i == 0:
                x = x + spatial_pos[None].astype(x.dtype)
                x = pos_drop(x, deterministic=deterministic)

            x = block_cls(
                dim=c,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path=float(dpr[i]),
                with_time_emb=self.with_time_emb,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                name=f"ste_block_{i}",
            )(x, True, t, deterministic)
            x = spatial_norm(x)

            if i == 0:
                x = x + temporal_pos[:, :, None, :].astype(x.dtype)
                x = pos_drop(x, deterministic=deterministic)

            x = block_cls(
                dim=c,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path=float(dpr[i]),
                with_time_emb=self.with_time_emb,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                name=f"tte_block_{i}",
            )(x, False, t, deterministic)
            x = temporal_norm(x)

        if self.mode == "s2f":
            # Learned weighted mean over frames (reference s2f weighted_mean
            # Conv1d(F -> 1, k=1) applied on [B, F, J*C]).
            w = self.param(
                "weighted_mean_kernel",
                make_torch_bias_init(self.num_frame),
                (self.num_frame,),
                jnp.float32,
            )
            wb = self.param(
                "weighted_mean_bias",
                make_torch_bias_init(self.num_frame),
                (1,),
                jnp.float32,
            )
            x = jnp.einsum("bfpc,f->bpc", x, w.astype(x.dtype))[:, None] + wb.astype(x.dtype)

        x = nn.LayerNorm(epsilon=1e-5, name="head_norm")(x)
        x = TorchDense(self.out_dim, dtype=self.dtype, name="head")(x)
        return x
