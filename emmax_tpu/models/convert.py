"""Weight conversion: PyTorch/HF/TIMM checkpoints → emmax_tpu param pytrees.

Covers (a) HF transformers modules (LlamaForCausalLM, Dinov2WithRegisters,
SiglipVisionModel) used by the parity tests, (b) TIMM ViT naming used by the
reference Prismatic ``.pt`` checkpoints
(``/root/reference/prismatic/models/vlms/prismatic.py:111-120`` — state dict
split ``{"model": {"projector", "llm_backbone", "vision_backbone"}}``), and
(c) the reference's HF-port naming (inverse of
``vla-scripts/extern/convert_openvla_weights_to_hf.py:84-117``).

All conversions normalize to:
- linear kernels transposed to [in, out] (JAX ``x @ W`` convention),
- ViT qkv fused to one [D, 3D] kernel,
- ViT pos_embed always [1, prefix_cls + N, D]; TIMM ``no_embed_class``
  checkpoints get a zero row prepended for the class token (mathematically
  identical: TIMM adds pos only to patches and concatenates cls after).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from emmax_tpu.models.llama import LlamaConfig
from emmax_tpu.models.vit import ViTConfig

Params = Dict[str, Any]


def _np(t) -> np.ndarray:
    """torch tensor / array-like -> float32 numpy (host)."""
    if hasattr(t, "detach"):
        t = t.detach().to("cpu").float().numpy()
    return np.asarray(t, dtype=np.float32)


def _stack(sd: Mapping[str, Any], fmt: str, n: int, transpose=False) -> np.ndarray:
    mats = [_np(sd[fmt.format(i)]) for i in range(n)]
    if transpose:
        mats = [m.T for m in mats]
    return np.stack(mats)


# --- Llama ------------------------------------------------------------------

def convert_hf_llama(sd: Mapping[str, Any], cfg: LlamaConfig) -> Params:
    """HF ``LlamaForCausalLM.state_dict()`` → llama param tree."""
    L = cfg.n_layers
    pre = "model.layers.{}."
    return {
        "embed": _np(sd["model.embed_tokens.weight"]),
        "layers": {
            "attn_norm": _stack(sd, pre + "input_layernorm.weight", L),
            "wq": _stack(sd, pre + "self_attn.q_proj.weight", L, transpose=True),
            "wk": _stack(sd, pre + "self_attn.k_proj.weight", L, transpose=True),
            "wv": _stack(sd, pre + "self_attn.v_proj.weight", L, transpose=True),
            "wo": _stack(sd, pre + "self_attn.o_proj.weight", L, transpose=True),
            "mlp_norm": _stack(sd, pre + "post_attention_layernorm.weight", L),
            "w_gate": _stack(sd, pre + "mlp.gate_proj.weight", L, transpose=True),
            "w_up": _stack(sd, pre + "mlp.up_proj.weight", L, transpose=True),
            "w_down": _stack(sd, pre + "mlp.down_proj.weight", L, transpose=True),
        },
        "final_norm": _np(sd["model.norm.weight"]),
        "lm_head": _np(sd["lm_head.weight"]).T,
    }


# --- ViT helpers --------------------------------------------------------------

def _conv_to_patch_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv [D, C, ph, pw] → [ph*pw*C, D] matching ``vit.patchify``."""
    d = w.shape[0]
    return w.transpose(2, 3, 1, 0).reshape(-1, d)


def resize_pos_embed(pos: np.ndarray, src_grid: int, dst_grid: int,
                     has_cls_row: bool) -> np.ndarray:
    """Bicubic grid interpolation (TIMM/HF ``interpolate_pos_encoding``)."""
    if src_grid == dst_grid:
        return pos
    import jax
    import jax.numpy as jnp

    cls_row = pos[:, :1] if has_cls_row else None
    grid = pos[:, 1:] if has_cls_row else pos
    d = grid.shape[-1]
    grid = grid.reshape(1, src_grid, src_grid, d)
    grid = np.asarray(jax.image.resize(
        jnp.asarray(grid), (1, dst_grid, dst_grid, d), method="bicubic"))
    grid = grid.reshape(1, dst_grid * dst_grid, d)
    return np.concatenate([cls_row, grid], axis=1) if has_cls_row else grid


def _fuse_qkv(qw, kw, vw, qb, kb, vb):
    """[D_out, D_in] triples → kernel [D_in, 3D_out], bias [3D_out]."""
    kernel = np.concatenate([qw.T, kw.T, vw.T], axis=-1)
    bias = np.concatenate([qb, kb, vb], axis=-1)
    return kernel, bias


# --- HF DINOv2 (with registers) -----------------------------------------------

def convert_hf_dinov2(sd: Mapping[str, Any], cfg: ViTConfig) -> Params:
    """HF ``Dinov2WithRegistersModel.state_dict()`` → vit param tree."""
    L = cfg.depth
    pre = "encoder.layer.{}."

    def fused(i):
        a = pre.format(i) + "attention.attention."
        return _fuse_qkv(
            _np(sd[a + "query.weight"]), _np(sd[a + "key.weight"]),
            _np(sd[a + "value.weight"]), _np(sd[a + "query.bias"]),
            _np(sd[a + "key.bias"]), _np(sd[a + "value.bias"]))

    fused_all = [fused(i) for i in range(L)]
    pos = _np(sd["embeddings.position_embeddings"])
    src_grid = int(round((pos.shape[1] - 1) ** 0.5))
    pos = resize_pos_embed(pos, src_grid, cfg.grid, has_cls_row=True)
    params: Params = {
        "patch_embed": {
            "kernel": _conv_to_patch_kernel(
                _np(sd["embeddings.patch_embeddings.projection.weight"])),
            "bias": _np(sd["embeddings.patch_embeddings.projection.bias"]),
        },
        "cls_token": _np(sd["embeddings.cls_token"]),
        "reg_tokens": _np(sd["embeddings.register_tokens"]),
        "pos_embed": pos,
        "blocks": {
            "norm1_scale": _stack(sd, pre + "norm1.weight", L),
            "norm1_bias": _stack(sd, pre + "norm1.bias", L),
            "wqkv": np.stack([f[0] for f in fused_all]),
            "bqkv": np.stack([f[1] for f in fused_all]),
            "wo": _stack(sd, pre + "attention.output.dense.weight", L, transpose=True),
            "bo": _stack(sd, pre + "attention.output.dense.bias", L),
            "ls1": _stack(sd, pre + "layer_scale1.lambda1", L),
            "norm2_scale": _stack(sd, pre + "norm2.weight", L),
            "norm2_bias": _stack(sd, pre + "norm2.bias", L),
            "w1": _stack(sd, pre + "mlp.fc1.weight", L, transpose=True),
            "b1": _stack(sd, pre + "mlp.fc1.bias", L),
            "w2": _stack(sd, pre + "mlp.fc2.weight", L, transpose=True),
            "b2": _stack(sd, pre + "mlp.fc2.bias", L),
            "ls2": _stack(sd, pre + "layer_scale2.lambda1", L),
        },
        "final_norm": {"scale": _np(sd["layernorm.weight"]),
                       "bias": _np(sd["layernorm.bias"])},
    }
    return params


# --- HF SigLIP vision -----------------------------------------------------------

def convert_hf_siglip(sd: Mapping[str, Any], cfg: ViTConfig,
                      prefix: str = "vision_model.") -> Params:
    L = cfg.depth
    pre = prefix + "encoder.layers.{}."

    def fused(i):
        a = pre.format(i) + "self_attn."
        return _fuse_qkv(
            _np(sd[a + "q_proj.weight"]), _np(sd[a + "k_proj.weight"]),
            _np(sd[a + "v_proj.weight"]), _np(sd[a + "q_proj.bias"]),
            _np(sd[a + "k_proj.bias"]), _np(sd[a + "v_proj.bias"]))

    fused_all = [fused(i) for i in range(L)]
    pos = _np(sd[prefix + "embeddings.position_embedding.weight"])[None]
    src_grid = int(round(pos.shape[1] ** 0.5))
    pos = resize_pos_embed(pos, src_grid, cfg.grid, has_cls_row=False)
    return {
        "patch_embed": {
            "kernel": _conv_to_patch_kernel(
                _np(sd[prefix + "embeddings.patch_embedding.weight"])),
            "bias": _np(sd[prefix + "embeddings.patch_embedding.bias"]),
        },
        "pos_embed": pos,
        "blocks": {
            "norm1_scale": _stack(sd, pre + "layer_norm1.weight", L),
            "norm1_bias": _stack(sd, pre + "layer_norm1.bias", L),
            "wqkv": np.stack([f[0] for f in fused_all]),
            "bqkv": np.stack([f[1] for f in fused_all]),
            "wo": _stack(sd, pre + "self_attn.out_proj.weight", L, transpose=True),
            "bo": _stack(sd, pre + "self_attn.out_proj.bias", L),
            "norm2_scale": _stack(sd, pre + "layer_norm2.weight", L),
            "norm2_bias": _stack(sd, pre + "layer_norm2.bias", L),
            "w1": _stack(sd, pre + "mlp.fc1.weight", L, transpose=True),
            "b1": _stack(sd, pre + "mlp.fc1.bias", L),
            "w2": _stack(sd, pre + "mlp.fc2.weight", L, transpose=True),
            "b2": _stack(sd, pre + "mlp.fc2.bias", L),
        },
        "final_norm": {"scale": _np(sd[prefix + "post_layernorm.weight"]),
                       "bias": _np(sd[prefix + "post_layernorm.bias"])},
    }


# --- TIMM ViT (reference Prismatic checkpoints store TIMM modules) --------------

def convert_timm_vit(sd: Mapping[str, Any], cfg: ViTConfig) -> Params:
    """TIMM ``VisionTransformer.state_dict()`` → vit param tree.

    Handles ``no_embed_class`` checkpoints (pos rows == num_patches) by
    prepending a zero class-pos row — numerically identical ordering.
    """
    L = cfg.depth
    pre = "blocks.{}."
    pos = _np(sd["pos_embed"])
    # cls row present iff rows == grid^2 + 1 (TIMM no_embed_class stores
    # patch-only pos embeddings)
    n_rows = pos.shape[1]
    has_cls_row = cfg.class_token and int(round((n_rows - 1) ** 0.5)) ** 2 == n_rows - 1
    src_grid = int(round((n_rows - 1) ** 0.5)) if has_cls_row else int(round(n_rows ** 0.5))
    pos = resize_pos_embed(pos, src_grid, cfg.grid, has_cls_row=has_cls_row)
    if cfg.class_token and not has_cls_row:
        pos = np.concatenate([np.zeros((1, 1, pos.shape[-1]), pos.dtype), pos], axis=1)

    params: Params = {
        "patch_embed": {
            "kernel": _conv_to_patch_kernel(_np(sd["patch_embed.proj.weight"])),
            "bias": _np(sd["patch_embed.proj.bias"]),
        },
        "pos_embed": pos,
        "blocks": {
            "norm1_scale": _stack(sd, pre + "norm1.weight", L),
            "norm1_bias": _stack(sd, pre + "norm1.bias", L),
            "wqkv": _stack(sd, pre + "attn.qkv.weight", L, transpose=True),
            "bqkv": _stack(sd, pre + "attn.qkv.bias", L),
            "wo": _stack(sd, pre + "attn.proj.weight", L, transpose=True),
            "bo": _stack(sd, pre + "attn.proj.bias", L),
            "norm2_scale": _stack(sd, pre + "norm2.weight", L),
            "norm2_bias": _stack(sd, pre + "norm2.bias", L),
            "w1": _stack(sd, pre + "mlp.fc1.weight", L, transpose=True),
            "b1": _stack(sd, pre + "mlp.fc1.bias", L),
            "w2": _stack(sd, pre + "mlp.fc2.weight", L, transpose=True),
            "b2": _stack(sd, pre + "mlp.fc2.bias", L),
        },
        "final_norm": {"scale": _np(sd["norm.weight"]),
                       "bias": _np(sd["norm.bias"])},
    }
    if cfg.class_token:
        params["cls_token"] = _np(sd["cls_token"])
    if cfg.num_reg_tokens:
        params["reg_tokens"] = _np(sd["reg_token"])
    if cfg.layerscale:
        # TIMM names LayerScale weight `gamma` (older) or `scale_factor`
        # (HF-compat patch, modeling_prismatic.py:49-59)
        key1 = pre + ("ls1.gamma" if "blocks.0.ls1.gamma" in sd else "ls1.scale_factor")
        key2 = pre + ("ls2.gamma" if "blocks.0.ls2.gamma" in sd else "ls2.scale_factor")
        params["blocks"]["ls1"] = _stack(sd, key1, L)
        params["blocks"]["ls2"] = _stack(sd, key2, L)
    if cfg.pre_norm:
        params["pre_norm"] = {"scale": _np(sd["norm_pre.weight"]),
                              "bias": _np(sd["norm_pre.bias"])}
    return params


# --- Projector -------------------------------------------------------------------

def convert_projector(sd: Mapping[str, Any], prefix: str = "projector.") -> Params:
    """Reference ``FusedMLPProjector`` nn.Sequential state dict
    (``nn_utils.py:37-53``: linear layers at indices 0, 2, 4) or the 2-layer /
    1-layer variants → projector param tree."""
    idxs = sorted({int(k.split(".")[-2]) for k in sd
                   if k.startswith(prefix) and k.endswith(".weight")})
    layers = []
    for i in idxs:
        layers.append({
            "kernel": _np(sd[f"{prefix}{i}.weight"]).T,
            "bias": _np(sd[f"{prefix}{i}.bias"]),
        })
    return {"layers": layers}


def params_to_prismatic_sd(params, cfg) -> dict:
    """emmax_tpu param tree → reference-layout torch state dicts
    ``{"projector", "llm_backbone", "vision_backbone"}`` (the inverse of
    ``convert_prismatic_pt``; key remaps documented at
    ``vla-scripts/extern/convert_openvla_weights_to_hf.py:84-117``)."""
    import numpy as np
    import torch

    def t(x):
        return torch.tensor(np.asarray(x, np.float32))

    llm = params["llm"]
    llm_sd = {"llm.model.embed_tokens.weight": t(llm["embed"]),
              "llm.model.norm.weight": t(llm["final_norm"]),
              "llm.lm_head.weight": t(np.asarray(llm["lm_head"]).T)}
    L = np.asarray(llm["layers"]["wq"]).shape[0]
    names = {"attn_norm": "input_layernorm.weight",
             "mlp_norm": "post_attention_layernorm.weight"}
    mats = {"wq": "self_attn.q_proj.weight", "wk": "self_attn.k_proj.weight",
            "wv": "self_attn.v_proj.weight", "wo": "self_attn.o_proj.weight",
            "w_gate": "mlp.gate_proj.weight", "w_up": "mlp.up_proj.weight",
            "w_down": "mlp.down_proj.weight"}
    for i in range(L):
        for k, hf in names.items():
            llm_sd[f"llm.model.layers.{i}.{hf}"] = t(llm["layers"][k][i])
        for k, hf in mats.items():
            llm_sd[f"llm.model.layers.{i}.{hf}"] = t(
                np.asarray(llm["layers"][k][i]).T)

    vis_sd = {}
    for name, vcfg in cfg.vision:
        pre = f"{name}_featurizer."
        p = params["vision"][name]
        D = vcfg.dim
        pk = np.asarray(p["patch_embed"]["kernel"])
        vis_sd[pre + "patch_embed.proj.weight"] = t(
            pk.reshape(vcfg.patch_size, vcfg.patch_size, 3, D)
            .transpose(3, 2, 0, 1))
        vis_sd[pre + "patch_embed.proj.bias"] = t(p["patch_embed"]["bias"])
        vis_sd[pre + "pos_embed"] = t(p["pos_embed"])
        if vcfg.class_token:
            vis_sd[pre + "cls_token"] = t(p["cls_token"])
        if vcfg.num_reg_tokens:
            vis_sd[pre + "reg_token"] = t(p["reg_tokens"])
        b = p["blocks"]
        for i in range(vcfg.depth):
            bp = f"{pre}blocks.{i}."
            vis_sd[bp + "norm1.weight"] = t(b["norm1_scale"][i])
            vis_sd[bp + "norm1.bias"] = t(b["norm1_bias"][i])
            vis_sd[bp + "attn.qkv.weight"] = t(np.asarray(b["wqkv"][i]).T)
            vis_sd[bp + "attn.qkv.bias"] = t(b["bqkv"][i])
            vis_sd[bp + "attn.proj.weight"] = t(np.asarray(b["wo"][i]).T)
            vis_sd[bp + "attn.proj.bias"] = t(b["bo"][i])
            vis_sd[bp + "norm2.weight"] = t(b["norm2_scale"][i])
            vis_sd[bp + "norm2.bias"] = t(b["norm2_bias"][i])
            vis_sd[bp + "mlp.fc1.weight"] = t(np.asarray(b["w1"][i]).T)
            vis_sd[bp + "mlp.fc1.bias"] = t(b["b1"][i])
            vis_sd[bp + "mlp.fc2.weight"] = t(np.asarray(b["w2"][i]).T)
            vis_sd[bp + "mlp.fc2.bias"] = t(b["b2"][i])
            if vcfg.layerscale:
                vis_sd[bp + "ls1.gamma"] = t(b["ls1"][i])
                vis_sd[bp + "ls2.gamma"] = t(b["ls2"][i])
        vis_sd[pre + "norm.weight"] = t(p["final_norm"]["scale"])
        vis_sd[pre + "norm.bias"] = t(p["final_norm"]["bias"])

    proj_sd = {}
    for li, layer in enumerate(params["projector"]["layers"]):
        proj_sd[f"projector.{2 * li}.weight"] = t(np.asarray(layer["kernel"]).T)
        proj_sd[f"projector.{2 * li}.bias"] = t(layer["bias"])

    return {"projector": proj_sd, "llm_backbone": llm_sd,
            "vision_backbone": vis_sd}


# --- HF-hub (OpenVLA ``modeling_prismatic``) flat format ----------------------

_HF_FC = {0: "fc1", 2: "fc2", 4: "fc3"}


def params_to_hf_sd(params, cfg) -> dict:
    """emmax_tpu param tree → ONE flat HF-hub state dict in the published
    OpenVLA ``modeling_prismatic`` naming (``language_model.*``,
    ``vision_backbone.featurizer.* / .fused_featurizer.*`` with LayerScale
    ``scale_factor``, ``projector.fc{1,2,3}.*``) — the format the reference's
    ``convert_openvla_weights_to_hf.py:84-117`` produces, so checkpoints
    trained here load into the HF remote-code class."""
    parts = params_to_prismatic_sd(params, cfg)
    sd = {}
    for k, v in parts["llm_backbone"].items():
        sd["language_model." + k[len("llm."):]] = v
    names = [name for name, _ in cfg.vision]
    vis_prefix = {names[0]: "vision_backbone.featurizer."}
    if len(names) > 1:
        vis_prefix[names[1]] = "vision_backbone.fused_featurizer."
    for k, v in parts["vision_backbone"].items():
        name, rest = k.split("_featurizer.", 1)
        for ls in ("ls1", "ls2"):
            rest = rest.replace(f"{ls}.gamma", f"{ls}.scale_factor")
        sd[vis_prefix[name] + rest] = v
    for k, v in parts["projector"].items():
        _, idx, leaf = k.split(".")
        sd[f"projector.{_HF_FC[int(idx)]}.{leaf}"] = v
    return sd


def convert_hf_openvla_sd(sd: Mapping[str, Any], cfg) -> Params:
    """Flat HF-hub (OpenVLA) state dict → emmax_tpu param tree (inverse of
    ``params_to_hf_sd``; ``scale_factor`` is handled by ``convert_timm_vit``)."""
    names = [name for name, _ in cfg.vision]
    vis_prefix = {"vision_backbone.featurizer.": names[0]}
    if len(names) > 1:
        vis_prefix["vision_backbone.fused_featurizer."] = names[1]
    vision_params = {}
    for prefix, name in vis_prefix.items():
        vcfg = dict(cfg.vision)[name]
        sub = {k[len(prefix):]: v for k, v in sd.items()
               if k.startswith(prefix)}
        vision_params[name] = convert_timm_vit(sub, vcfg)
    llm_sub = {k[len("language_model."):]: v for k, v in sd.items()
               if k.startswith("language_model.")}
    llm_params = convert_hf_llama(llm_sub, cfg.llm)
    fc_to_idx = {v: k for k, v in _HF_FC.items()}
    proj_sd = {}
    for k, v in sd.items():
        if k.startswith("projector."):
            _, fc, leaf = k.split(".")
            proj_sd[f"projector.{fc_to_idx[fc]}.{leaf}"] = v
    proj_params = convert_projector(proj_sd, prefix="projector.")
    return {"vision": vision_params, "projector": proj_params,
            "llm": llm_params}
