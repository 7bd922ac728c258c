"""Normalization layers (functional).

fp32 accumulation for mean/variance regardless of input dtype — required for
bf16 training stability on TPU; output is cast back to the input dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x, weight, eps: float = 1e-5):
    """Llama RMSNorm (matches transformers LlamaRMSNorm semantics: variance
    in fp32, scale applied in the input dtype)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return xf.astype(dtype) * weight.astype(dtype)


def layer_norm(x, weight, bias, eps: float = 1e-6):
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = xf.astype(dtype)
    return out * weight.astype(dtype) + bias.astype(dtype)
