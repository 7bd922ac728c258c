"""Vision transformers (DINOv2-with-registers, SigLIP, CLIP, IN1K) — functional JAX.

TPU-first re-design of the reference TIMM-based vision backbones
(``/root/reference/prismatic/models/backbones/vision/base_vision.py:94-207``,
``dinosiglip_vit.py:43-164``). One ``ViTConfig`` covers every tower; blocks
are stacked on a leading axis and iterated with ``lax.scan``.

Design notes:
- patch embedding is expressed as reshape + one big matmul (maps straight
  onto the MXU; equivalent to stride-p conv).
- feature extraction matches TIMM ``get_intermediate_layers(n={depth-2})``
  exactly (``base_vision.py:124-128``): run blocks ``0..depth-2`` (i.e. skip
  the final block), NO final norm, strip class/register tokens.
- DINOv2 embedding order matches facebook/HF semantics: pos-embed over
  [cls|patches], register tokens spliced in *after* the pos add.
- layer norm in fp32, GELU exact (DINOv2/CLIP) or tanh-approx (SigLIP).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from emmax_tpu.ops.attention import multi_head_attention
from emmax_tpu.parallel.constraints import constrain_batch_sharded
from emmax_tpu.ops.norms import layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: int = 224
    patch_size: int = 14
    dim: int = 1024
    depth: int = 24
    n_heads: int = 16
    hidden_dim: int = 4096
    class_token: bool = True
    num_reg_tokens: int = 0
    layerscale: bool = False
    ls_init: float = 1e-5
    gelu_tanh: bool = False        # SigLIP uses gelu_pytorch_tanh
    quick_gelu: bool = False       # CLIP uses x * sigmoid(1.702 x)
    norm_eps: float = 1e-6
    pre_norm: bool = False         # CLIP applies a LN before the blocks

    @property
    def grid(self) -> int:
        # floor division: 384px/14 towers (SigLIP-384) use a 27x27 grid over
        # the top-left 378px (valid-padding conv semantics)
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def num_prefix(self) -> int:
        return int(self.class_token) + self.num_reg_tokens

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads


# The two Emma-X towers (dinosiglip-vit-so-224px, dinosiglip_vit.py:21-30).
DINOV2_L_REG4 = ViTConfig(dim=1024, depth=24, n_heads=16, hidden_dim=4096,
                          class_token=True, num_reg_tokens=4, layerscale=True)
SIGLIP_SO400M = ViTConfig(dim=1152, depth=27, n_heads=16, hidden_dim=4304,
                          class_token=False, num_reg_tokens=0,
                          layerscale=False, gelu_tanh=True)
# Additional reference towers (clip_vit.py / in1k_vit.py shapes)
CLIP_L = ViTConfig(dim=1024, depth=24, n_heads=16, hidden_dim=4096,
                   class_token=True, pre_norm=True, quick_gelu=True,
                   norm_eps=1e-5)
CLIP_L_336 = dataclasses.replace(CLIP_L, img_size=336)
SIGLIP_SO400M_384 = dataclasses.replace(SIGLIP_SO400M, img_size=384)
DINOV2_L_REG4_384 = dataclasses.replace(DINOV2_L_REG4, img_size=384)
IN1K_L = ViTConfig(img_size=224, patch_size=16, dim=1024, depth=24,
                   n_heads=16, hidden_dim=4096, class_token=True)


def init_vit_params(rng: jax.Array, cfg: ViTConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(rng, 24))

    def norm01(key, shape, std=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * std).astype(dtype)

    L, D, F, P = cfg.depth, cfg.dim, cfg.hidden_dim, cfg.patch_size
    params: Params = {
        "patch_embed": {
            "kernel": norm01(next(keys), (P * P * 3, D)),
            "bias": jnp.zeros((D,), dtype),
        },
        "pos_embed": norm01(
            next(keys),
            (1, cfg.num_patches + int(cfg.class_token), D)),
        "blocks": {
            "norm1_scale": jnp.ones((L, D), dtype),
            "norm1_bias": jnp.zeros((L, D), dtype),
            "wqkv": norm01(next(keys), (L, D, 3 * D)),
            "bqkv": jnp.zeros((L, 3 * D), dtype),
            "wo": norm01(next(keys), (L, D, D)),
            "bo": jnp.zeros((L, D), dtype),
            "norm2_scale": jnp.ones((L, D), dtype),
            "norm2_bias": jnp.zeros((L, D), dtype),
            "w1": norm01(next(keys), (L, D, F)),
            "b1": jnp.zeros((L, F), dtype),
            "w2": norm01(next(keys), (L, F, D)),
            "b2": jnp.zeros((L, D), dtype),
        },
        "final_norm": {"scale": jnp.ones((D,), dtype),
                       "bias": jnp.zeros((D,), dtype)},
    }
    if cfg.class_token:
        params["cls_token"] = norm01(next(keys), (1, 1, D))
    if cfg.num_reg_tokens:
        params["reg_tokens"] = norm01(next(keys), (1, cfg.num_reg_tokens, D))
    if cfg.layerscale:
        params["blocks"]["ls1"] = jnp.full((L, D), cfg.ls_init, dtype)
        params["blocks"]["ls2"] = jnp.full((L, D), cfg.ls_init, dtype)
    if cfg.pre_norm:
        params["pre_norm"] = {"scale": jnp.ones((D,), dtype),
                              "bias": jnp.zeros((D,), dtype)}
    return params


def patchify(images: jax.Array, patch: int) -> jax.Array:
    """[B, H, W, 3] -> [B, N, patch*patch*3] with (ph, pw, c) pixel order.

    Non-divisible resolutions are cropped top-left (valid-conv semantics).
    """
    B, H, W, C = images.shape
    gh, gw = H // patch, W // patch       # per-axis grids: a single H-based
    # grid silently cropped (or crashed on) non-square inputs
    if H % patch or W % patch:
        images = images[:, :gh * patch, :gw * patch, :]
    x = images.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, gh * gw, patch * patch * C)


def _embed(params: Params, cfg: ViTConfig, images: jax.Array) -> jax.Array:
    images = constrain_batch_sharded(images)
    x = constrain_batch_sharded(patchify(images, cfg.patch_size))
    x = x @ params["patch_embed"]["kernel"] + params["patch_embed"]["bias"]
    B = x.shape[0]
    if cfg.class_token:
        cls = jnp.broadcast_to(params["cls_token"], (B, 1, cfg.dim)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)
    if cfg.num_reg_tokens:
        reg = jnp.broadcast_to(params["reg_tokens"],
                               (B, cfg.num_reg_tokens, cfg.dim)).astype(x.dtype)
        # registers follow the class token (timm: [cls, reg..., patches]);
        # without a class token they lead — splicing after x[:, :1] would
        # bury patch 0 inside the prefix that strip_prefix removes
        n_lead = 1 if cfg.class_token else 0
        x = jnp.concatenate([x[:, :n_lead], reg, x[:, n_lead:]], axis=1)
    if cfg.pre_norm:
        x = layer_norm(x, params["pre_norm"]["scale"], params["pre_norm"]["bias"],
                       cfg.norm_eps)
    return x


def _block(h, p, cfg: ViTConfig, attn_impl: str):
    # NOTE: no sharding constraint here — with_sharding_constraint inside a
    # lax.scan body whose scanned-over params are sharded miscompiles (wrong
    # VALUES, reproduced on jax 0.9 CPU with both GSPMD and Shardy on a
    # 3-axis mesh; /tmp-level repro in tests/test_sharding_training.py).
    # The carry is anchored once, before the scan, in vit_forward.
    B, L, D = h.shape
    x = layer_norm(h, p["norm1_scale"], p["norm1_bias"], cfg.norm_eps)
    qkv = x @ p["wqkv"] + p["bqkv"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, L, cfg.n_heads, cfg.head_dim)
    k = k.reshape(B, L, cfg.n_heads, cfg.head_dim)
    v = v.reshape(B, L, cfg.n_heads, cfg.head_dim)
    attn = multi_head_attention(q, k, v, impl=attn_impl).reshape(B, L, D)
    attn = attn @ p["wo"] + p["bo"]
    if cfg.layerscale:
        attn = attn * p["ls1"].astype(attn.dtype)
    h = h + attn
    x = layer_norm(h, p["norm2_scale"], p["norm2_bias"], cfg.norm_eps)
    x = x @ p["w1"] + p["b1"]
    if cfg.quick_gelu:
        x = x * jax.nn.sigmoid(1.702 * x)
    else:
        x = jax.nn.gelu(x, approximate=cfg.gelu_tanh)
    x = x @ p["w2"] + p["b2"]
    if cfg.layerscale:
        x = x * p["ls2"].astype(x.dtype)
    return h + x


def vit_forward(params: Params, cfg: ViTConfig, images: jax.Array, *,
                num_blocks: Optional[int] = None, strip_prefix: bool = True,
                final_norm: bool = False, attn_impl: str = "xla") -> jax.Array:
    """images [B, H, W, 3] (already normalized) -> features [B, N(, +prefix), D].

    Defaults produce the Emma-X feature contract: second-to-last block
    (``num_blocks = depth - 1`` applied blocks), no final norm, patches only.
    """
    if num_blocks is None:
        num_blocks = cfg.depth - 1
    h = _embed(params, cfg, images)
    # anchor the carry's batch sharding ONCE before the scan (see _block
    # note: constraints inside scan bodies miscompile)
    h = constrain_batch_sharded(h)

    def body(h, p):
        return _block(h, p, cfg, attn_impl), None

    sliced = jax.tree_util.tree_map(lambda a: a[:num_blocks], params["blocks"])
    h, _ = jax.lax.scan(body, h, sliced)
    if final_norm:
        h = layer_norm(h, params["final_norm"]["scale"],
                       params["final_norm"]["bias"], cfg.norm_eps)
    if strip_prefix and cfg.num_prefix:
        h = h[:, cfg.num_prefix:]
    return h
