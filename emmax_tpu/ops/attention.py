"""Attention dispatch: XLA reference implementation + Pallas kernel hook.

The model code calls ``multi_head_attention`` with a named ``impl``; "xla"
is the always-available fp32-softmax reference (and the target XLA fuses well
on TPU already), "pallas" routes to the flash-attention kernels in
``emmax_tpu.ops.flash_attention`` (replacement for the reference's
flash-attn-2 CUDA dependency, ``base_llm.py:111,125``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -2.3819763e38  # large negative for masking (fits bf16/fp32)


def _repeat_kv(k, n_rep: int):
    if n_rep == 1:
        return k
    b, l, h, d = k.shape
    return jnp.repeat(k, n_rep, axis=2)


def xla_attention(q, k, v, *, mask: Optional[jax.Array] = None) -> jax.Array:
    """q [B, Lq, H, hd]; k/v [B, Lk, KVH, hd]; mask broadcastable to
    [B, H, Lq, Lk] (True = attend). Softmax in fp32; output in q.dtype."""
    n_rep = q.shape[2] // k.shape[2]
    k = _repeat_kv(k, n_rep)
    v = _repeat_kv(v, n_rep)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v)
    return out


def causal_mask(q_len: int, kv_len: int, q_offset=0):
    """[1, 1, q_len, kv_len] bool: query i attends to kv j <= i + offset.
    ``q_offset`` may be a traced scalar (decode step index)."""
    qi = jnp.arange(q_len)[:, None] + q_offset
    kj = jnp.arange(kv_len)[None, :]
    return (kj <= qi)[None, None, :, :]


def multi_head_attention(q, k, v, *, mask=None, impl: str = "xla") -> jax.Array:
    if impl == "xla":
        return xla_attention(q, k, v, mask=mask)
    if impl == "pallas":
        from emmax_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, mask=mask)
    raise ValueError(f"unknown attention impl {impl!r}")
