"""Rotary position embeddings (Llama-style, non-interleaved "rotate_half").

Matches the transformers Llama implementation: frequencies
``theta^(-2i/d)`` over the first half of the head dim, cos/sin computed in
fp32, applied as ``x*cos + rotate_half(x)*sin``.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_cos_sin(positions, head_dim: int, theta: float = 10000.0):
    """positions [..., L] int -> (cos, sin) each [..., L, head_dim] fp32."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [..., L, hd/2]
    angles = jnp.concatenate([angles, angles], axis=-1)           # [..., L, hd]
    return jnp.cos(angles), jnp.sin(angles)


def rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def apply_rope(x, cos, sin):
    """x [..., L, n_heads, head_dim]; cos/sin [..., L, head_dim]."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    c = cos[..., :, None, :]
    s = sin[..., :, None, :]
    return (xf * c + rotate_half(xf) * s).astype(dtype)
