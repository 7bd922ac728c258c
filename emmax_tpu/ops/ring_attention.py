"""Ring attention: context-parallel attention over a mesh axis.

Sequence-parallel extension beyond the reference (SURVEY §5 notes the
reference has no long-context machinery; context is capped at 2048). Ring
attention shards the KV sequence over a mesh axis and rotates KV blocks
around the ring with ``jax.lax.ppermute`` while each device accumulates an
online softmax — communication is point-to-point on ICI neighbors and
overlaps with compute, so long contexts scale with the ring size.

Layout: inside ``shard_map`` each device holds q/k/v shards
``[B, L/N, H, D]``; the public wrapper takes full arrays + a mesh axis.
Causal masking uses absolute positions (each rotated block remembers the
chip it originated on).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

NEG_INF = -2.3819763e38


def _block_attn(q, k, v, q_start, kv_start, kv_mask_blk, causal, sm_scale):
    """One (q_shard x kv_block) attention piece → (scores-stats, pv).

    q [B, Lq, H, D]; k/v [B, Lk, H, D]. Returns (m [B,H,Lq,1],
    p_sum [B,H,Lq,1], pv [B,Lq,H,D]) with p relative to local max m."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    Lq, Lk = q.shape[1], k.shape[1]
    mask = None
    if causal:
        qi = q_start + jnp.arange(Lq)[:, None]
        kj = kv_start + jnp.arange(Lk)[None, :]
        mask = (kj <= qi)[None, None]
    if kv_mask_blk is not None:
        km = kv_mask_blk[:, None, None, :]
        mask = km if mask is None else (mask & km)
    if mask is not None:
        s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)               # [B,H,Lq,1]
    p = jnp.exp(s - m)
    p_sum = jnp.sum(p, axis=-1, keepdims=True)
    pv = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)
    return m, p_sum, pv


def _ring_attention_shard(q, k, v, kv_mask, *, axis_name: str, causal: bool,
                          sm_scale: float):
    """Per-shard body (inside shard_map)."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, Lq, H, D = q.shape
    Lk = k.shape[1]
    q_start = idx * Lq

    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, t):
        m_acc, l_acc, o_acc, k_blk, v_blk, km_blk = carry
        src = (idx - t) % n                  # origin chip of current block
        kv_start = src * Lk
        m_new, p_sum, pv = _block_attn(q, k_blk, v_blk, q_start, kv_start,
                                       km_blk, causal, sm_scale)
        m_next = jnp.maximum(m_acc, m_new)
        alpha = jnp.exp(m_acc - m_next)
        beta = jnp.exp(m_new - m_next)
        l_next = alpha * l_acc + beta * p_sum
        # o accumulates unnormalized sums scaled to m_next
        o_next = (o_acc * jnp.moveaxis(alpha, 1, 2)
                  + pv.astype(jnp.float32) * jnp.moveaxis(beta, 1, 2))
        # rotate KV to the next chip (skip after the final step)
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        if km_blk is not None:
            km_blk = jax.lax.ppermute(km_blk, axis_name, perm)
        return (m_next, l_next, o_next, k_blk, v_blk, km_blk), None

    m0 = jnp.full((B, H, Lq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, H, Lq, 1), jnp.float32)
    o0 = jnp.zeros((B, Lq, H, D), jnp.float32)
    (m, l, o, _, _, _), _ = jax.lax.scan(
        step, (m0, l0, o0, k, v, kv_mask), jnp.arange(n))
    l_safe = jnp.where(l == 0.0, 1.0, l)
    out = o / jnp.moveaxis(l_safe, 1, 2)
    return out.astype(q.dtype)


def ring_attention(q, k, v, *, mesh: Mesh, axis_name: str = "fsdp",
                   kv_mask: Optional[jax.Array] = None, causal: bool = True,
                   sm_scale: Optional[float] = None) -> jax.Array:
    """Context-parallel attention: q/k/v [B, L, H, D] sharded on L over
    ``axis_name``; output sharded the same way.

    L must divide by the axis size. Each device sees only L/N of the KV
    sequence at a time; blocks rotate N times.
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    n = mesh.shape[axis_name]
    assert q.shape[1] % n == 0, (q.shape, n)

    seq_spec = P(None, axis_name, None, None)
    mask_spec = P(None, axis_name)
    body = partial(_ring_attention_shard, axis_name=axis_name, causal=causal,
                   sm_scale=sm_scale)

    if kv_mask is not None:
        fn = jax.shard_map(lambda q, k, v, m: body(q, k, v, m), mesh=mesh,
                           in_specs=(seq_spec, seq_spec, seq_spec, mask_spec),
                           out_specs=seq_spec, check_vma=False)
        return fn(q, k, v, kv_mask)
    fn = jax.shard_map(lambda q, k, v: body(q, k, v, None), mesh=mesh,
                       in_specs=(seq_spec, seq_spec, seq_spec),
                       out_specs=seq_spec, check_vma=False)
    return fn(q, k, v)
