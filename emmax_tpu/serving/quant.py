"""Int8 weight-only quantization for serving.

TPU counterpart of the reference's bitsandbytes 8-bit inference path
(``/root/reference/vla-scripts/extern/verify_openvla.py:31-60`` load_in_8bit):
per-output-channel symmetric int8 for the LLM matmul weights. Batch-1 decode
is weight-bandwidth-bound (one full read of the parameters per token), so
halving weight bytes directly raises tokens/sec; the int8→bf16 convert fuses
into the matmul (see ``emmax_tpu.models.llama.mm``).

The embedding table stays bf16 (it is gathered, not streamed) and norms stay
as-is. Vision towers/projector run once per frame in the compute-bound
prefill and are left untouched by default.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

# llama-family (w_gate/w_up/w_down) + phi-family (w1/w2) matmul weights;
# biases and norms are never quantized
QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down", "w1", "w2")


def quantize_weight(w: jax.Array) -> Dict[str, jax.Array]:
    """[..., in, out] → {"q8": int8, "scale": f32 [..., 1, out]}."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q8": q, "scale": scale}


def dequantize_weight(qw: Dict[str, jax.Array], dtype=jnp.float32) -> jax.Array:
    return (qw["q8"].astype(jnp.float32) * qw["scale"]).astype(dtype)


def quantize_llm_params(llm_params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize the decoder matmul weights + lm_head in place-of (returns a
    new tree; embed/norms unchanged)."""
    out = dict(llm_params)
    layers = dict(llm_params["layers"])
    for key in QUANT_KEYS:
        if key in layers and not isinstance(layers[key], dict):
            layers[key] = quantize_weight(layers[key])
    out["layers"] = layers
    out["lm_head"] = _quantize_lm_head(out.get("lm_head"), quantize_weight)
    return out


def _quantize_lm_head(lm_head, quant_fn):
    """Dense array (llama) or {"kernel", "bias"} dict (phi) → quantized."""
    if lm_head is None:
        return None
    if isinstance(lm_head, dict):
        if "kernel" in lm_head and not isinstance(lm_head["kernel"], dict):
            return {**lm_head, "kernel": quant_fn(lm_head["kernel"])}
        return lm_head  # already quantized
    return quant_fn(lm_head)


def quantize_vlm_params(params: Dict[str, Any], bits: int = 8,
                        group: int | None = None) -> Dict[str, Any]:
    """VLM tree with the LLM subtree quantized (jnp; see *_np for host-side).

    ``group`` (int4 only) overrides the quantization group size along the
    input dim — smaller groups trade scale-row traffic for accuracy (see
    docs/BENCHMARKS.md quant-quality table: g64 is the quality-tilted
    option, g128 the throughput default).
    """
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    if group is not None and bits != 4:
        raise ValueError("group is only meaningful for bits=4")
    out = dict(params)
    if bits == 4:
        from emmax_tpu.ops.int4_matmul import (DEFAULT_GROUP,
                                               quantize_weight_int4)

        def q4(w):
            return quantize_weight_int4(w, group=group or DEFAULT_GROUP)

        llm = dict(params["llm"])
        layers = dict(llm["layers"])
        for key in QUANT_KEYS:
            if key in layers and not isinstance(layers[key], dict):
                layers[key] = q4(layers[key])
        llm["layers"] = layers
        llm["lm_head"] = _quantize_lm_head(llm.get("lm_head"), q4)
        out["llm"] = llm
    else:
        out["llm"] = quantize_llm_params(params["llm"])
    return out


def quantize_weight_np(w) -> Dict[str, Any]:
    """Host-side (numpy) mirror of ``quantize_weight`` — used at load time so
    the bf16 and int8 trees never coexist in HBM."""
    import numpy as np

    wf = np.asarray(w, np.float32)
    absmax = np.max(np.abs(wf), axis=-2, keepdims=True)
    scale = np.where(absmax == 0, 1.0, absmax / 127.0).astype(np.float32)
    q = np.clip(np.round(wf / scale), -127, 127).astype(np.int8)
    return {"q8": q, "scale": scale}


def quantize_vlm_params_np(params: Dict[str, Any],
                           bits: int = 8) -> Dict[str, Any]:
    """``bits=8``: per-channel int8. ``bits=4``: nibble-packed group-wise
    int4 (``ops/int4_matmul`` Pallas dequant kernel) — half the weight
    bytes of int8 again, the last big single-chip decode-bandwidth lever."""
    import numpy as np

    if bits == 4:
        from emmax_tpu.ops.int4_matmul import quantize_weight_int4_np

        def qfn(w):
            return quantize_weight_int4_np(np.asarray(w))
    elif bits == 8:
        def qfn(w):
            return quantize_weight_np(np.asarray(w))
    else:
        raise ValueError(f"bits must be 4 or 8, got {bits}")

    out = dict(params)
    layers = dict(params["llm"]["layers"])
    for key in QUANT_KEYS:
        if key in layers and not isinstance(layers[key], dict):
            layers[key] = qfn(layers[key])
    llm = dict(params["llm"])
    llm["layers"] = layers
    llm["lm_head"] = _quantize_lm_head(llm.get("lm_head"), qfn)
    out["llm"] = llm
    return out
