"""Attention dispatch: XLA reference implementation + Pallas flash kernels.

The model passes *structured* mask information — ``kv_mask`` ([B, S] slot
validity), ``causal`` flag, and ``q_offset`` (absolute position of the first
query, e.g. the KV-cache write cursor) — instead of a dense [B, H, Lq, Lk]
mask, so the Pallas kernels can build masks per tile and skip fully-masked
tiles. ``impl="xla"`` is the always-available fp32-softmax reference;
``impl="pallas"`` routes to ``emmax_tpu.ops.flash_attention`` (the TPU
replacement for the reference's flash-attn-2 CUDA dependency,
``/root/reference/prismatic/models/backbones/llm/base_llm.py:111,125``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -2.3819763e38  # large negative for masking (fits bf16/fp32)


def _repeat_kv(k, n_rep: int):
    return k if n_rep == 1 else jnp.repeat(k, n_rep, axis=2)


def _dense_mask(q_len: int, kv_len: int, kv_mask, causal: bool,
                q_offset, chunk_mask=None):
    """[B or 1, 1, q_len, kv_len] bool (True = attend).

    ``q_offset`` may be a scalar or a per-row [B] vector (continuous
    batching: every row sits at its own cache cursor).

    ``chunk_mask`` ([q_len, q_len] bool) replaces the CAUSAL intra-chunk
    relation for the q_len tokens written at cache slots
    [q_offset, q_offset + q_len): query i attends past slots (< q_offset)
    plus chunk slot j iff ``chunk_mask[i, j]`` — the ancestor matrix of a
    speculative verification TREE (every root→leaf path is verified as its
    own causal continuation in ONE forward)."""
    mask = None
    if chunk_mask is not None:
        qo = jnp.asarray(q_offset)
        if qo.ndim == 0:
            qo = qo[None]                                      # [1]
        kj = jnp.arange(kv_len)
        rel = kj[None, :] - qo[:, None]                        # [B, kv]
        in_chunk = (rel >= 0) & (rel < q_len)
        # chunk_mask[:, rel] -> [q_len, B, kv] -> [B, q_len, kv]
        cm = jnp.transpose(
            chunk_mask[:, jnp.clip(rel, 0, q_len - 1)], (1, 0, 2))
        allowed = jnp.where(in_chunk[:, None, :], cm,
                            (rel < 0)[:, None, :])
        mask = allowed[:, None]                                # [B,1,q,kv]
    elif causal:
        qo = jnp.asarray(q_offset)
        kj = jnp.arange(kv_len)
        if qo.ndim == 0:
            qi = jnp.arange(q_len)[:, None] + qo
            mask = (kj[None, :] <= qi)[None, None]
        else:
            qi = qo[:, None] + jnp.arange(q_len)[None, :]      # [B, Lq]
            mask = (kj[None, None, :] <= qi[:, :, None])[:, None]
    if kv_mask is not None:
        km = kv_mask[:, None, None, :]
        mask = km if mask is None else (mask & km)
    return mask


def xla_attention(q, k, v, *, kv_mask=None, causal: bool = False,
                  q_offset=0, chunk_mask=None) -> jax.Array:
    """q [B, Lq, H, hd]; k/v [B, Lk, KVH, hd]; softmax fp32."""
    n_rep = q.shape[2] // k.shape[2]
    k = _repeat_kv(k, n_rep)
    v = _repeat_kv(v, n_rep)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    mask = _dense_mask(q.shape[1], k.shape[1], kv_mask, causal,
                       q_offset, chunk_mask)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v)


def resolve_attn_impl(impl: str) -> str:
    """"auto" → pallas on TPU, xla elsewhere (CPU tests, interpret mode)."""
    if impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return impl


def multi_head_attention(q, k, v, *, kv_mask=None, causal: bool = False,
                         q_offset=0, impl: str = "xla",
                         chunk_mask=None) -> jax.Array:
    """Unified attention entry point.

    q [B, Lq, H, hd]; k/v [B, Lk, KVH, hd]; kv_mask [B, Lk] bool or None;
    ``q_offset`` may be a traced scalar (decode step index).
    ``impl``: "xla" | "pallas" | "pallas_fused" | "auto" ("pallas_fused"
    folds dq into the backward's dkv kernel — identical forward).
    ``chunk_mask`` (speculative-tree verification, see ``_dense_mask``)
    always takes the XLA path — tree chunks are a handful of tokens, not a
    flash-kernel shape.
    """
    impl = resolve_attn_impl(impl)
    if impl == "xla" or chunk_mask is not None:
        return xla_attention(q, k, v, kv_mask=kv_mask, causal=causal,
                             q_offset=q_offset, chunk_mask=chunk_mask)
    if impl in ("pallas", "pallas_fused"):
        # "pallas_fused" additionally folds dq into the backward's dkv
        # kernel (training-path A/B lever; identical forward)
        if getattr(jnp.asarray(q_offset), "ndim", 0) > 0:
            # per-row cursors (continuous batching) — xla path
            return xla_attention(q, k, v, kv_mask=kv_mask, causal=causal,
                                 q_offset=q_offset)
        from emmax_tpu.ops.flash_attention import flash_attention

        n_rep = q.shape[2] // k.shape[2]
        return flash_attention(q, _repeat_kv(k, n_rep), _repeat_kv(v, n_rep),
                               kv_mask=kv_mask, causal=causal,
                               q_offset=q_offset,
                               fused_bwd=(impl == "pallas_fused"))
    raise ValueError(f"unknown attention impl {impl!r}")
