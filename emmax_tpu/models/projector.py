"""Vision→LLM projectors (linear / gelu-mlp / fused-gelu-mlp).

Counterpart of ``/root/reference/prismatic/util/nn_utils.py:12-53``. The
Emma-X flagship uses ``fused-gelu-mlp``: fused_dim → 4·fused_dim → llm_dim →
llm_dim with exact GELU between layers.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def projector_dims(arch_specifier: str, vision_dim: int, llm_dim: int):
    kind = arch_specifier.split("+")[-1]
    if kind == "linear":
        return [(vision_dim, llm_dim)]
    if kind == "gelu-mlp":
        return [(vision_dim, llm_dim), (llm_dim, llm_dim)]
    if kind == "fused-gelu-mlp":
        return [(vision_dim, 4 * vision_dim), (4 * vision_dim, llm_dim),
                (llm_dim, llm_dim)]
    raise ValueError(f"unsupported projector arch {arch_specifier!r}")


def init_projector_params(rng: jax.Array, arch_specifier: str,
                          vision_dim: int, llm_dim: int,
                          dtype=jnp.float32) -> Params:
    dims = projector_dims(arch_specifier, vision_dim, llm_dim)
    keys = jax.random.split(rng, len(dims))
    layers = []
    for key, (d_in, d_out) in zip(keys, dims):
        # torch nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in))
        bound = d_in ** -0.5
        layers.append({
            "kernel": jax.random.uniform(key, (d_in, d_out), jnp.float32,
                                         -bound, bound).astype(dtype),
            "bias": jnp.zeros((d_out,), dtype),
        })
    return {"layers": layers}


def projector_forward(params: Params, x: jax.Array) -> jax.Array:
    layers = params["layers"]
    for i, layer in enumerate(layers):
        x = x @ layer["kernel"] + layer["bias"]
        if i + 1 < len(layers):
            x = jax.nn.gelu(x, approximate=False)
    return x
