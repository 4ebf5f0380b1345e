"""Convert reference PyTorch checkpoints to this framework's flax param tree.

The reference saves ``torch.save({'model_diffusion': DataParallel(GaussianDiffusion(
MixSTE)).state_dict(), ...})`` so keys look like ``module.model.STEblocks.0.attn.
qkv.weight`` plus schedule buffers (``module.betas`` etc.) which we skip — the
engine recomputes them in float64 (exactly like the reference's own eval-time
load skips every buffer whose name contains 'alphas', reference run.py:226-235).

Only numpy is required here; tensors are accepted as anything with ``.numpy()``
or as numpy arrays (so tests can feed ``{k: v.numpy()}`` without importing
torch in this module).
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    if hasattr(v, "detach"):
        v = v.detach()
    if hasattr(v, "numpy"):
        return v.numpy()
    return np.asarray(v)


def _strip_prefixes(state: Mapping[str, object]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state.items():
        if k.startswith("module."):
            k = k[len("module.") :]
        if k.startswith("model."):
            k = k[len("model.") :]
        out[k] = v
    return out


def _linear(dst: dict, torch_state, torch_name: str, has_bias: bool = True):
    w = _np(torch_state[f"{torch_name}.weight"])
    dst["kernel"] = np.ascontiguousarray(w.T)  # torch [out,in] -> flax [in,out]
    if has_bias and f"{torch_name}.bias" in torch_state:
        dst["bias"] = _np(torch_state[f"{torch_name}.bias"])


def _layernorm(torch_state, torch_name: str) -> dict:
    return {
        "scale": _np(torch_state[f"{torch_name}.weight"]),
        "bias": _np(torch_state[f"{torch_name}.bias"]),
    }


def convert_torch_state_dict(
    state_dict: Mapping[str, object],
    depth: int,
    with_time_emb: bool = True,
    mode: str = "s2s",
) -> dict:
    """Map a reference MixSTE state dict onto the MixSTEDenoiser param tree."""
    ts = _strip_prefixes(state_dict)
    params: dict = {}

    fusion: dict = {}
    _linear(fusion, ts, "fusion_layer")
    params["fusion_layer"] = fusion

    if with_time_emb:
        # nn.Sequential(SinusoidalPosEmb, Linear, GELU, Linear) -> indices 1 and 3.
        tm1, tm2 = {}, {}
        _linear(tm1, ts, "time_mlp.1")
        _linear(tm2, ts, "time_mlp.3")
        params["time_mlp_1"] = tm1
        params["time_mlp_2"] = tm2

    params["spatial_pos_embed"] = _np(ts["Spatial_pos_embed"])
    params["temporal_pos_embed"] = _np(ts["Temporal_pos_embed"])

    for kind, torch_prefix in (("ste_block", "STEblocks"), ("tte_block", "TTEblocks")):
        for i in range(depth):
            tp = f"{torch_prefix}.{i}"
            blk: dict = {
                "norm1": _layernorm(ts, f"{tp}.norm1"),
                "norm2": _layernorm(ts, f"{tp}.norm2"),
            }
            attn_qkv, attn_proj = {}, {}
            _linear(attn_qkv, ts, f"{tp}.attn.qkv")
            _linear(attn_proj, ts, f"{tp}.attn.proj")
            blk["attn"] = {"qkv": attn_qkv, "proj": attn_proj}
            fc1, fc2 = {}, {}
            _linear(fc1, ts, f"{tp}.mlp.fc1")
            _linear(fc2, ts, f"{tp}.mlp.fc2")
            blk["mlp"] = {"fc1": fc1, "fc2": fc2}
            if with_time_emb:
                # Block.time_mlp = nn.Sequential(SiLU, Linear) -> index 1.
                tproj: dict = {}
                _linear(tproj, ts, f"{tp}.time_mlp.1")
                blk["time_proj"] = tproj
            params[f"{kind}_{i}"] = blk

    params["spatial_norm"] = _layernorm(ts, "Spatial_norm")
    params["temporal_norm"] = _layernorm(ts, "Temporal_norm")

    # head = nn.Sequential(LayerNorm, Linear).
    params["head_norm"] = _layernorm(ts, "head.0")
    head: dict = {}
    _linear(head, ts, "head.1")
    params["head"] = head

    if mode == "s2f":
        # Conv1d(F -> 1, k=1): weight [1, F, 1] -> [F], bias [1].
        params["weighted_mean_kernel"] = _np(ts["weighted_mean.weight"]).reshape(-1)
        params["weighted_mean_bias"] = _np(ts["weighted_mean.bias"]).reshape(-1)

    return params


def load_matching_params(target_params: dict, source_params: dict) -> tuple:
    """Tolerant partial loading (reference: common/utils.py load_pretrained_
    weights:51-81): copy every leaf whose path and shape match; keep the
    target's value otherwise. Returns (merged_params, matched, discarded)."""
    import jax

    flat_t = dict(jax.tree_util.tree_flatten_with_path(target_params)[0])
    flat_s = dict(jax.tree_util.tree_flatten_with_path(source_params)[0])
    matched, discarded = [], []
    merged = dict(flat_t)
    for path, leaf in flat_s.items():
        if path in flat_t and tuple(np.shape(leaf)) == tuple(np.shape(flat_t[path])):
            merged[path] = leaf
            matched.append(path)
        else:
            discarded.append(path)
    treedef = jax.tree_util.tree_structure(target_params)
    ordered = [merged[p] for p, _ in jax.tree_util.tree_flatten_with_path(target_params)[0]]
    return jax.tree_util.tree_unflatten(treedef, ordered), matched, discarded


# ----------------------------------------------------------------------
# Inverse direction: flax param tree -> reference torch state-dict names.
# Closes the trained-weight parity chain (VERDICT r4 Next #2): weights
# trained HERE can be loaded into the reference model
# (common/nets/model_conditional_diffusion_mixste_s2s_grand_linLift.py)
# and run through the reference's own ddim_sample_loop for an end-to-end
# torch-vs-jax comparison at flagship geometry.
# ----------------------------------------------------------------------

def _inv_linear(dst: Dict[str, np.ndarray], layer: Mapping, torch_name: str):
    k = _np(layer["kernel"])
    dst[f"{torch_name}.weight"] = np.ascontiguousarray(
        np.asarray(k, np.float32).T  # flax [in,out] -> torch [out,in]
    )
    if "bias" in layer:
        dst[f"{torch_name}.bias"] = np.asarray(_np(layer["bias"]), np.float32)


def _inv_layernorm(dst: Dict[str, np.ndarray], ln: Mapping, torch_name: str):
    dst[f"{torch_name}.weight"] = np.asarray(_np(ln["scale"]), np.float32)
    dst[f"{torch_name}.bias"] = np.asarray(_np(ln["bias"]), np.float32)


def convert_params_to_torch_state_dict(
    params: Mapping,
    depth: int,
    with_time_emb: bool = True,
    mode: str = "s2s",
) -> Dict[str, np.ndarray]:
    """MixSTEDenoiser param tree -> reference-model state dict (numpy).

    Keys match ``ConditionalDiffusionMixSTES2SGRANDLinLift.state_dict()``
    (no ``module.``/``model.`` prefixes — load directly into the bare
    reference model with ``strict=True`` after ``torch.from_numpy``).
    Exact inverse of convert_torch_state_dict (round-trip tested in
    tests/test_model.py)."""
    sd: Dict[str, np.ndarray] = {}
    _inv_linear(sd, params["fusion_layer"], "fusion_layer")
    if with_time_emb:
        _inv_linear(sd, params["time_mlp_1"], "time_mlp.1")
        _inv_linear(sd, params["time_mlp_2"], "time_mlp.3")
    sd["Spatial_pos_embed"] = np.asarray(_np(params["spatial_pos_embed"]), np.float32)
    sd["Temporal_pos_embed"] = np.asarray(_np(params["temporal_pos_embed"]), np.float32)

    for kind, torch_prefix in (("ste_block", "STEblocks"), ("tte_block", "TTEblocks")):
        for i in range(depth):
            blk = params[f"{kind}_{i}"]
            tp = f"{torch_prefix}.{i}"
            _inv_layernorm(sd, blk["norm1"], f"{tp}.norm1")
            _inv_layernorm(sd, blk["norm2"], f"{tp}.norm2")
            _inv_linear(sd, blk["attn"]["qkv"], f"{tp}.attn.qkv")
            _inv_linear(sd, blk["attn"]["proj"], f"{tp}.attn.proj")
            _inv_linear(sd, blk["mlp"]["fc1"], f"{tp}.mlp.fc1")
            _inv_linear(sd, blk["mlp"]["fc2"], f"{tp}.mlp.fc2")
            if with_time_emb and "time_proj" in blk:
                _inv_linear(sd, blk["time_proj"], f"{tp}.time_mlp.1")

    _inv_layernorm(sd, params["spatial_norm"], "Spatial_norm")
    _inv_layernorm(sd, params["temporal_norm"], "Temporal_norm")
    _inv_layernorm(sd, params["head_norm"], "head.0")
    _inv_linear(sd, params["head"], "head.1")

    if mode == "s2f":
        f = int(np.shape(_np(params["weighted_mean_kernel"]))[0])
        sd["weighted_mean.weight"] = np.asarray(
            _np(params["weighted_mean_kernel"]), np.float32
        ).reshape(1, f, 1)
        sd["weighted_mean.bias"] = np.asarray(
            _np(params["weighted_mean_bias"]), np.float32
        ).reshape(1)
    return sd
