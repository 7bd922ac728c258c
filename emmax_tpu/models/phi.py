"""Phi-2 decoder (functional JAX).

Counterpart of the reference's Phi backbone
(``/root/reference/prismatic/models/backbones/llm/phi.py:20-44``, HF
``PhiForCausalLM``). Architecture differs from Llama: parallel
attention+MLP residual off a single biased LayerNorm, partial rotary
embeddings (``rotary_dim = partial_rotary_factor * head_dim``), biased
linears, ``gelu_new`` activation, biased final LayerNorm and lm_head.
Same stacked-layer ``lax.scan`` + KV-cache design as ``llama.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from emmax_tpu.models.llama import mm
from emmax_tpu.ops.attention import multi_head_attention
from emmax_tpu.ops.norms import layer_norm
from emmax_tpu.ops.rope import rope_cos_sin, rotate_half

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class PhiConfig:
    vocab_size: int = 51200
    dim: int = 2560
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 32
    hidden_dim: int = 10240
    rope_theta: float = 10000.0
    partial_rotary_factor: float = 0.4
    norm_eps: float = 1e-5
    max_seq_len: int = 2048

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def rotary_dim(self) -> int:
        return int(self.partial_rotary_factor * self.head_dim)


PHI_2 = PhiConfig()


def init_phi_params(rng: jax.Array, cfg: PhiConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(rng, 16))

    def norm01(key, shape):
        return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(dtype)

    L, D, H, hd, F = cfg.n_layers, cfg.dim, cfg.n_heads, cfg.head_dim, cfg.hidden_dim
    return {
        "embed": norm01(next(keys), (cfg.vocab_size, D)),
        "layers": {
            "ln_scale": jnp.ones((L, D), dtype),
            "ln_bias": jnp.zeros((L, D), dtype),
            "wq": norm01(next(keys), (L, D, H * hd)),
            "bq": jnp.zeros((L, H * hd), dtype),
            "wk": norm01(next(keys), (L, D, cfg.n_kv_heads * hd)),
            "bk": jnp.zeros((L, cfg.n_kv_heads * hd), dtype),
            "wv": norm01(next(keys), (L, D, cfg.n_kv_heads * hd)),
            "bv": jnp.zeros((L, cfg.n_kv_heads * hd), dtype),
            "wo": norm01(next(keys), (L, H * hd, D)),
            "bo": jnp.zeros((L, D), dtype),
            "w1": norm01(next(keys), (L, D, F)),
            "b1": jnp.zeros((L, F), dtype),
            "w2": norm01(next(keys), (L, F, D)),
            "b2": jnp.zeros((L, D), dtype),
        },
        "final_norm": {"scale": jnp.ones((D,), dtype),
                       "bias": jnp.zeros((D,), dtype)},
        "lm_head": {"kernel": norm01(next(keys), (D, cfg.vocab_size)),
                    "bias": jnp.zeros((cfg.vocab_size,), dtype)},
    }


def _apply_partial_rope(x, cos, sin, rotary_dim: int):
    """Rotate only the first ``rotary_dim`` channels of each head."""
    dtype = x.dtype
    rot, keep = x[..., :rotary_dim], x[..., rotary_dim:]
    rf = rot.astype(jnp.float32)
    c = cos[..., :, None, :]
    s = sin[..., :, None, :]
    rot = (rf * c + rotate_half(rf) * s).astype(dtype)
    return jnp.concatenate([rot, keep], axis=-1)


def phi_forward(params: Params, cfg: PhiConfig, inputs_embeds: jax.Array, *,
                mask: Optional[jax.Array] = None,
                positions: Optional[jax.Array] = None,
                kv_cache: Optional[Params] = None, attn_impl: str = "xla",
                remat: bool = False, logits_dtype=jnp.float32,
                return_hidden: bool = False,
                chunk_attn_mask: Optional[jax.Array] = None,
                scan_weight_barrier: bool = False
                ) -> Tuple[jax.Array, Optional[Params]]:
    """Same contract as ``llama_forward`` (incl. ``return_hidden`` for
    chunked-CE heads and ``chunk_attn_mask`` for tree-verify chunks, so a
    Phi-backed VLM supports ce_chunk training and tree speculation)."""
    if chunk_attn_mask is not None and kv_cache is None:
        raise ValueError("chunk_attn_mask requires a kv_cache (tree chunks "
                         "are a decode-path construct)")
    B, L, D = inputs_embeds.shape
    if positions is None:
        if mask is not None:
            positions = jnp.clip(jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1, 0)
        else:
            positions = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), (B, L))
    cos, sin = rope_cos_sin(positions, cfg.rotary_dim, cfg.rope_theta)

    def gelu_new(x):
        return jax.nn.gelu(x, approximate=True)

    new_cache = None
    if kv_cache is None:
        def body(h, p):
            if scan_weight_barrier:
                # see llama.py: fence weight slices so backward can't hoist
                # full-stack layout-transposed copies out of the layer scan
                p = {k: (jax.lax.optimization_barrier(v)
                         if isinstance(v, jax.Array) and v.ndim >= 2 else v)
                     for k, v in p.items()}
            x = layer_norm(h, p["ln_scale"], p["ln_bias"], cfg.norm_eps)
            q = (mm(x, p["wq"]) + p["bq"]).reshape(B, L, cfg.n_heads, cfg.head_dim)
            k = (mm(x, p["wk"]) + p["bk"]).reshape(B, L, cfg.n_kv_heads, cfg.head_dim)
            v = (mm(x, p["wv"]) + p["bv"]).reshape(B, L, cfg.n_kv_heads, cfg.head_dim)
            q = _apply_partial_rope(q, cos, sin, cfg.rotary_dim)
            k = _apply_partial_rope(k, cos, sin, cfg.rotary_dim)
            attn = multi_head_attention(q, k, v, kv_mask=mask, causal=True,
                                        impl=attn_impl)
            attn = mm(attn.reshape(B, L, -1), p["wo"]) + p["bo"]
            mlp = mm(gelu_new(mm(x, p["w1"]) + p["b1"]), p["w2"]) + p["b2"]
            return h + attn + mlp, None   # parallel residual

        body_fn = jax.checkpoint(body) if remat else body
        h, _ = jax.lax.scan(body_fn, inputs_embeds, params["layers"])
    else:
        S = kv_cache["k"].shape[2]
        t0 = kv_cache["len"]
        per_row = jnp.asarray(t0).ndim > 0   # per-row cursors (see llama.py)
        new_valid = (mask if mask is not None
                     else jnp.ones((B, L), jnp.bool_))
        if per_row:
            slot_mask = jax.vmap(
                lambda m, v, t: jax.lax.dynamic_update_slice(m, v, (t,))
            )(kv_cache["mask"], new_valid, t0)
        else:
            slot_mask = jax.lax.dynamic_update_slice(
                kv_cache["mask"], new_valid, (0, t0))

        if per_row:
            def _write(cache_all, new, i):
                updated = jax.vmap(
                    lambda c, n, t: jax.lax.dynamic_update_slice(
                        c, n, (t, 0, 0)))(cache_all[i], new, t0)
                return cache_all.at[i].set(updated)
        else:
            def _write(cache_all, new, i):
                return jax.lax.dynamic_update_slice(
                    cache_all, new[None], (i, 0, t0, 0, 0))

        quant = "k_scale" in kv_cache   # int8 cache (see llama.py)
        compute_dtype = inputs_embeds.dtype

        def _read(all_vals, all_scales, i):
            vals = jax.lax.dynamic_index_in_dim(all_vals, i, 0, keepdims=False)
            if all_scales is None:
                return vals
            sc = jax.lax.dynamic_index_in_dim(all_scales, i, 0, keepdims=False)
            return vals.astype(compute_dtype) * sc.astype(compute_dtype)

        # fori_loop for in-place cache updates (see llama.py — scan would
        # copy the whole cache per decoded token)
        def body(i, carry):
            h, k_all, v_all, ks_all, vs_all = carry
            from emmax_tpu.models.llama import layer_slice

            p = layer_slice(params["layers"], i)
            x = layer_norm(h, p["ln_scale"], p["ln_bias"], cfg.norm_eps)
            q = (mm(x, p["wq"]) + p["bq"]).reshape(B, L, cfg.n_heads, cfg.head_dim)
            k = (mm(x, p["wk"]) + p["bk"]).reshape(B, L, cfg.n_kv_heads, cfg.head_dim)
            v = (mm(x, p["wv"]) + p["bv"]).reshape(B, L, cfg.n_kv_heads, cfg.head_dim)
            q = _apply_partial_rope(q, cos, sin, cfg.rotary_dim)
            k = _apply_partial_rope(k, cos, sin, cfg.rotary_dim)
            if quant:
                from emmax_tpu.models.llama import _quantize_kv

                kq, ks = _quantize_kv(k)
                vq, vs = _quantize_kv(v)
                k_all = _write(k_all, kq, i)
                v_all = _write(v_all, vq, i)
                ks_all = _write(ks_all, ks, i)
                vs_all = _write(vs_all, vs, i)
            else:
                k_all = _write(k_all, k.astype(k_all.dtype), i)
                v_all = _write(v_all, v.astype(v_all.dtype), i)
            k_c = _read(k_all, ks_all if quant else None, i)
            v_c = _read(v_all, vs_all if quant else None, i)
            attn = multi_head_attention(q, k_c, v_c, kv_mask=slot_mask,
                                        causal=True, q_offset=t0,
                                        impl=attn_impl,
                                        chunk_mask=chunk_attn_mask)
            attn = mm(attn.reshape(B, L, -1), p["wo"]) + p["bo"]
            mlp = mm(gelu_new(mm(x, p["w1"]) + p["b1"]), p["w2"]) + p["b2"]
            return (h + attn + mlp, k_all, v_all, ks_all, vs_all)

        dummy = jnp.zeros((cfg.n_layers, 1, 1, 1, 1), jnp.float32)
        h, k_all, v_all, ks_all, vs_all = jax.lax.fori_loop(
            0, cfg.n_layers, body,
            (inputs_embeds, kv_cache["k"], kv_cache["v"],
             kv_cache.get("k_scale", dummy), kv_cache.get("v_scale", dummy)))
        new_cache = {"k": k_all, "v": v_all, "mask": slot_mask, "len": t0 + L}
        if quant:
            new_cache["k_scale"] = ks_all
            new_cache["v_scale"] = vs_all

    h = layer_norm(h, params["final_norm"]["scale"],
                   params["final_norm"]["bias"], cfg.norm_eps)
    if return_hidden:
        return h, new_cache
    logits = (mm(h, params["lm_head"]["kernel"])
              + params["lm_head"]["bias"]).astype(logits_dtype)
    return logits, new_cache


def convert_hf_phi(sd, cfg: PhiConfig) -> Params:
    """HF ``PhiForCausalLM.state_dict()`` → phi param tree."""
    from emmax_tpu.models.convert import _np, _stack

    L = cfg.n_layers
    pre = "model.layers.{}."
    return {
        "embed": _np(sd["model.embed_tokens.weight"]),
        "layers": {
            "ln_scale": _stack(sd, pre + "input_layernorm.weight", L),
            "ln_bias": _stack(sd, pre + "input_layernorm.bias", L),
            "wq": _stack(sd, pre + "self_attn.q_proj.weight", L, transpose=True),
            "bq": _stack(sd, pre + "self_attn.q_proj.bias", L),
            "wk": _stack(sd, pre + "self_attn.k_proj.weight", L, transpose=True),
            "bk": _stack(sd, pre + "self_attn.k_proj.bias", L),
            "wv": _stack(sd, pre + "self_attn.v_proj.weight", L, transpose=True),
            "bv": _stack(sd, pre + "self_attn.v_proj.bias", L),
            "wo": _stack(sd, pre + "self_attn.dense.weight", L, transpose=True),
            "bo": _stack(sd, pre + "self_attn.dense.bias", L),
            "w1": _stack(sd, pre + "mlp.fc1.weight", L, transpose=True),
            "b1": _stack(sd, pre + "mlp.fc1.bias", L),
            "w2": _stack(sd, pre + "mlp.fc2.weight", L, transpose=True),
            "b2": _stack(sd, pre + "mlp.fc2.bias", L),
        },
        "final_norm": {"scale": _np(sd["model.final_layernorm.weight"]),
                       "bias": _np(sd["model.final_layernorm.bias"])},
        "lm_head": {"kernel": _np(sd["lm_head.weight"]).T,
                    "bias": _np(sd["lm_head.bias"])},
    }
