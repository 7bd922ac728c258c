"""Llama-family decoder (Llama-2 / Mistral) — functional JAX.

TPU-first re-design of the reference's HF ``LlamaForCausalLM`` backbone
(``/root/reference/prismatic/models/backbones/llm/base_llm.py:101-223``,
``llama2.py:55-102``): parameters live in a nested pytree with all decoder
layers **stacked on a leading axis** and the layer loop expressed as
``lax.scan`` — one compiled layer body instead of 32 unrolled ones — with
optional ``jax.checkpoint`` rematerialization replacing torch activation
checkpointing (``fsdp.py:174-186``).

Numerics match transformers' Llama: RMSNorm in fp32, RoPE rotate_half with
fp32 cos/sin, SwiGLU MLP, fp32 attention softmax (verified by the parity
tests in ``tests/test_llama_parity.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from emmax_tpu.ops.attention import multi_head_attention
from emmax_tpu.parallel.constraints import constrain_batch_sharded
from emmax_tpu.ops.norms import rms_norm
from emmax_tpu.ops.rope import apply_rope, rope_cos_sin

Params = Dict[str, Any]
IGNORE_INDEX = -100


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32064          # llama-2 32000 + <PAD>, padded to 64
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 32
    hidden_dim: int = 11008
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    max_seq_len: int = 2048

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads


# Llama-2-7B with the Emma-X padded vocab (llama2.py:73-76).
LLAMA2_7B = LlamaConfig()
LLAMA2_13B = LlamaConfig(dim=5120, n_layers=40, n_heads=40, n_kv_heads=40,
                         hidden_dim=13824)
MISTRAL_7B = LlamaConfig(vocab_size=32064, dim=4096, n_layers=32, n_heads=32,
                         n_kv_heads=8, hidden_dim=14336, max_seq_len=2048)


def init_llama_params(rng: jax.Array, cfg: LlamaConfig,
                      dtype=jnp.float32) -> Params:
    """Random init (normal 0.02) — real runs load converted weights.

    Large reduced-precision leaves take a memory-lean path: per-leading-
    slice sampling written in place with buffer donation. The naive
    whole-tensor ``normal(f32) * 0.02`` holds two f32 temps of the full
    stacked leaf — 11.5 GB transient for 7B's [32, 4096, 11008] — which
    makes a bf16 7B init unmaterializable on a 16 GB chip (the final
    params are only 12.6 GB). The f32 path and small leaves keep the
    original whole-tensor sampling byte-for-byte (golden fixtures pin it);
    lean-path values are deterministic per seed but differ from the f32
    path's cast (random init either way — real runs load weights)."""
    keys = iter(jax.random.split(rng, 16))

    def norm01(key, shape):
        n = 1
        for s in shape:
            n *= int(s)
        if dtype == jnp.float32 or n < (1 << 27):
            return (jax.random.normal(key, shape, jnp.float32)
                    * 0.02).astype(dtype)
        sub = jax.random.split(key, shape[0])
        out = jnp.zeros(shape, dtype)
        upd = jax.jit(
            lambda o, p, i: jax.lax.dynamic_update_slice(
                o, p[None].astype(dtype),
                (i,) + (0,) * (len(shape) - 1)),
            donate_argnums=0)
        for i in range(shape[0]):
            part = jax.random.normal(sub[i], shape[1:], jnp.float32) * 0.02
            out = upd(out, part, jnp.int32(i))
        return out

    L, D, H, KV, hd, F = (cfg.n_layers, cfg.dim, cfg.n_heads, cfg.n_kv_heads,
                          cfg.head_dim, cfg.hidden_dim)
    return {
        "embed": norm01(next(keys), (cfg.vocab_size, D)),
        "layers": {
            "attn_norm": jnp.ones((L, D), dtype),
            "wq": norm01(next(keys), (L, D, H * hd)),
            "wk": norm01(next(keys), (L, D, KV * hd)),
            "wv": norm01(next(keys), (L, D, KV * hd)),
            "wo": norm01(next(keys), (L, H * hd, D)),
            "mlp_norm": jnp.ones((L, D), dtype),
            "w_gate": norm01(next(keys), (L, D, F)),
            "w_up": norm01(next(keys), (L, D, F)),
            "w_down": norm01(next(keys), (L, F, D)),
        },
        "final_norm": jnp.ones((D,), dtype),
        "lm_head": norm01(next(keys), (D, cfg.vocab_size)),
    }


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int,
                  dtype=jnp.bfloat16, quantized: bool = False) -> Params:
    """Cache layout: [n_layers, B, S, KV, hd] + slot-validity mask.

    Serving packs prompts LEFT-padded (matching the reference's val collator,
    ``util/data_utils.py:146-195``) so every row's write cursor is shared.

    ``quantized=True`` stores K/V as int8 with per-(position, head) scales —
    half the cache HBM traffic and capacity (more slots for continuous
    batching) at ~1e-2 relative attention error. NOTE: int8 storage then
    OVERRIDES ``dtype`` (which only names the unquantized cache dtype).
    """
    shape = (cfg.n_layers, batch, max_len, cfg.n_kv_heads, cfg.head_dim)
    cache = {
        "mask": jnp.zeros((batch, max_len), jnp.bool_),
        "len": jnp.zeros((), jnp.int32),
    }
    if quantized:
        sshape = shape[:-1] + (1,)
        cache.update(k=jnp.zeros(shape, jnp.int8),
                     v=jnp.zeros(shape, jnp.int8),
                     k_scale=jnp.ones(sshape, jnp.float32),
                     v_scale=jnp.ones(sshape, jnp.float32))
    else:
        cache.update(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))
    return cache


def _quantize_kv(x):
    """[B, L, KV, hd] → (int8 values, f32 scales [B, L, KV, 1])."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale



def mm(x, w):
    """Matmul that understands quantized weights.

    ``w`` is a dense array, ``{"q8": int8 [..., in, out], "scale": f32
    [..., 1, out]}`` (per-output-channel symmetric int8,
    ``emmax_tpu.serving.quant``), or ``{"q4": int8 [..., in/2, out],
    "scale": bf16 [..., G, out]}`` (nibble-packed group-wise int4,
    ``emmax_tpu.ops.int4_matmul`` — dequantized inside a Pallas kernel).
    The int→bf16 convert fuses into the matmul so HBM traffic for the
    weight is halved (int8) or quartered (int4) — the win that matters for
    batch-1 decode, which is weight-bandwidth-bound.
    """
    if isinstance(w, dict):
        if "q4" in w:
            from emmax_tpu.ops.int4_matmul import int4_matmul

            return int4_matmul(x, w)
        return (x @ w["q8"].astype(x.dtype)) * w["scale"].astype(x.dtype)
    return x @ w


def layer_slice(layers: Params, i) -> Params:
    """Select layer ``i`` from stacked layer params inside a fori_loop body.

    Int4-quantized weights stay STACKED with the traced index attached
    (``{"q4", "scale", "layer"}``): slicing them here would materialize a
    full per-layer copy in HBM before the Pallas kernel runs (~2x decode
    weight traffic, measured); the kernel instead DMAs tiles straight from
    the stacked array via a scalar-prefetch index_map.
    """
    def index(a):
        return jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)

    out = {}
    for key, val in layers.items():
        if isinstance(val, dict) and "q4" in val:
            out[key] = {**val, "layer": i}
        elif isinstance(val, dict):
            out[key] = {k: index(v) for k, v in val.items()}
        else:
            out[key] = index(val)
    return out


def _layer(h, layer_params, cos, sin, kv_mask, cfg: LlamaConfig,
           attn_impl: str):
    """One decoder layer (uncached path, causal)."""
    p = layer_params
    # NOTE: no sharding constraint here — with_sharding_constraint inside a
    # lax.scan body over sharded stacked params miscompiles (wrong values;
    # see models/vit.py:_block). The carry is anchored before the scan.
    B, L, D = h.shape
    x = rms_norm(h, p["attn_norm"], cfg.norm_eps)
    q = mm(x, p["wq"]).reshape(B, L, cfg.n_heads, cfg.head_dim)
    k = mm(x, p["wk"]).reshape(B, L, cfg.n_kv_heads, cfg.head_dim)
    v = mm(x, p["wv"]).reshape(B, L, cfg.n_kv_heads, cfg.head_dim)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    attn_out = multi_head_attention(q, k, v, kv_mask=kv_mask, causal=True,
                                    impl=attn_impl)
    h = h + mm(attn_out.reshape(B, L, cfg.n_heads * cfg.head_dim), p["wo"])
    x = rms_norm(h, p["mlp_norm"], cfg.norm_eps)
    h = h + mm(jax.nn.silu(mm(x, p["w_gate"])) * mm(x, p["w_up"]), p["w_down"])
    return h


def llama_forward(
    params: Params,
    cfg: LlamaConfig,
    inputs_embeds: jax.Array,                 # [B, L, D]
    *,
    mask: Optional[jax.Array] = None,         # [B, L] bool (True = valid)
    positions: Optional[jax.Array] = None,    # [B, L] int32
    kv_cache: Optional[Params] = None,        # from init_kv_cache; None = no cache
    attn_impl: str = "xla",
    remat: bool = False,
    logits_dtype=jnp.float32,
    return_hidden: bool = False,
    chunk_attn_mask: Optional[jax.Array] = None,
    scan_weight_barrier: bool = False,
) -> Tuple[jax.Array, Optional[Params]]:
    """Returns (logits [B, L, V], updated_kv_cache_or_None).

    Without a cache: causal self-attention over the L tokens (+ padding mask).
    With a cache: the L tokens are written at slots [len, len+L) and attend to
    every valid cache slot ≤ their own (decode passes L == 1).

    ``return_hidden``: return the final-normed hidden states [B, L, D]
    instead of logits — for memory-lean heads that chunk the lm_head matmul
    (``chunked_ce_loss_and_preds``): fp32 [B, L, vocab] logits (+ their
    cotangent) dominate train-step temps at 7B scale.

    ``scan_weight_barrier`` (uncached path only): fence per-layer weight
    slices inside the layer scan so reverse-mode AD cannot hoist full-stack
    layout-transposed weight copies (see the body comment) — pass True when
    differentiating through this function at large scale.

    ``chunk_attn_mask`` ([L, L] bool, cache path only): ancestor matrix for
    speculative-TREE verification — the L chunk tokens attend past slots
    plus chunk slot j iff ``chunk_attn_mask[i, j]`` instead of causally
    (``ops/attention.py:_dense_mask``). Callers supply matching tree
    ``positions`` (depth, not slot order).
    """
    if chunk_attn_mask is not None and kv_cache is None:
        raise ValueError("chunk_attn_mask requires a kv_cache (tree chunks "
                         "verify against an existing context)")
    B, L, D = inputs_embeds.shape
    if positions is None:
        if mask is not None:
            positions = jnp.clip(jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1, 0)
        else:
            positions = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), (B, L))
        if kv_cache is not None:
            # cached continuation: the L tokens sit at slots [len, len+L),
            # so default RoPE positions must start at the cursor — without
            # this offset a cache-path call that omits `positions` applied
            # RoPE at 0..L-1 and silently produced wrong logits (review
            # round 3, confirmed numerically)
            t0_pos = jnp.asarray(kv_cache["len"])
            positions = positions + (t0_pos[:, None] if t0_pos.ndim > 0
                                     else t0_pos)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    new_cache = None
    if kv_cache is None:
        # anchor the carry's batch sharding ONCE before the scan (see
        # _layer note: constraints inside scan bodies miscompile)
        inputs_embeds = constrain_batch_sharded(inputs_embeds)

        def body(h, xs):
            if scan_weight_barrier:
                # Fence the per-layer weight slices so XLA cannot rewrite
                # transpose(dynamic-slice(W)) -> dynamic-slice(transpose(W))
                # and hoist a layout-transposed copy of the WHOLE stacked
                # weight out of the backward while-loop. At 7B the hoisted
                # copies of wq/wk/wv are 3 x 1.00 GB of HLO temps — the
                # difference between the align-stage step fitting one 16 GB
                # v5e chip or not. The total transpose work is unchanged
                # (per-layer slices are transposed once per step either
                # way); only the residency shrinks. Training-path only:
                # serving prefill keeps its measured executables untouched.
                xs = {k: (jax.lax.optimization_barrier(v)
                          if isinstance(v, jax.Array) and v.ndim >= 2
                          else v)
                      for k, v in xs.items()}
            h = _layer(h, xs, cos, sin, mask, cfg, attn_impl)
            return h, None

        # remat: False/"none" = store all layer activations (fastest when
        # HBM allows — no bwd recompute); True/"full" = reference-style
        # full activation checkpointing (fsdp.py:174-186 semantics: bwd
        # re-runs each layer's forward); "dots" = TPU-native middle ground
        # (save MXU outputs, recompute only the cheap VPU elementwise ops —
        # trades ~sum-of-dot-outputs HBM per layer for skipping the matmul
        # recompute, which is most of the remat FLOP overhead).
        if remat and remat != "none":
            policy = (jax.checkpoint_policies.dots_saveable
                      if remat == "dots" else None)
            body_fn = jax.checkpoint(body, policy=policy)
        else:
            body_fn = body
        h, _ = jax.lax.scan(body_fn, inputs_embeds, params["layers"])
    else:
        S = kv_cache["k"].shape[2]
        t0 = kv_cache["len"]
        per_row = jnp.asarray(t0).ndim > 0   # continuous batching cursors
        new_valid = (mask if mask is not None
                     else jnp.ones((B, L), jnp.bool_))
        if per_row:
            slot_mask = jax.vmap(
                lambda m, v, t: jax.lax.dynamic_update_slice(m, v, (t,))
            )(kv_cache["mask"], new_valid, t0)
        else:
            slot_mask = jax.lax.dynamic_update_slice(
                kv_cache["mask"], new_valid, (0, t0))

        # fori_loop (NOT scan) over layers: scan would re-stack the whole
        # [n_layers, B, S, KV, hd] cache as fresh `ys` every call — a full
        # cache copy per decoded token (~2x cache bytes of HBM traffic).
        # With fori_loop the cache is loop-carried state and the
        # dynamic_update_slice aliases in place.
        if per_row:
            # per-row cursors (continuous batching): fori of scalar-start
            # 5-D in-place updates. The previous vmapped-DUS-on-a-layer-
            # slice version (`cache_all[i]` gather + `.at[i].set` scatter)
            # materialized two full [B, S, KV, hd] slabs per layer per
            # step (~200 MB/layer at 7B/6-slot shapes) — it measured the
            # dense continuous engine at 155 agg tok/s vs the paged
            # engine's 424 on otherwise-equal work.
            def _write(cache_all, new, i):
                def body(b, arr):
                    return jax.lax.dynamic_update_slice(
                        arr, new[b][None, None].astype(arr.dtype),
                        (i, b, t0[b], 0, 0))
                return jax.lax.fori_loop(0, new.shape[0], body, cache_all)
        else:
            # single 5-D in-place update (the tuned decode hot path)
            def _write(cache_all, new, i):
                return jax.lax.dynamic_update_slice(
                    cache_all, new[None], (i, 0, t0, 0, 0))

        quant = "k_scale" in kv_cache
        compute_dtype = inputs_embeds.dtype

        def _read(all_vals, all_scales, i):
            vals = jax.lax.dynamic_index_in_dim(all_vals, i, 0,
                                                keepdims=False)
            if all_scales is None:
                return vals
            sc = jax.lax.dynamic_index_in_dim(all_scales, i, 0,
                                              keepdims=False)
            return vals.astype(compute_dtype) * sc.astype(compute_dtype)

        def body(i, carry):
            h, k_all, v_all, ks_all, vs_all = carry
            p = layer_slice(params["layers"], i)
            x = rms_norm(h, p["attn_norm"], cfg.norm_eps)
            k_new = mm(x, p["wk"]).reshape(B, L, cfg.n_kv_heads, cfg.head_dim)
            v_new = mm(x, p["wv"]).reshape(B, L, cfg.n_kv_heads, cfg.head_dim)
            k_new = apply_rope(k_new, cos, sin)
            if quant:
                kq, ks = _quantize_kv(k_new)
                vq, vs = _quantize_kv(v_new)
                k_all = _write(k_all, kq, i)
                v_all = _write(v_all, vq, i)
                ks_all = _write(ks_all, ks, i)
                vs_all = _write(vs_all, vs, i)
            else:
                k_all = _write(k_all, k_new.astype(k_all.dtype), i)
                v_all = _write(v_all, v_new.astype(v_all.dtype), i)
            k_c = _read(k_all, ks_all if quant else None, i)
            v_c = _read(v_all, vs_all if quant else None, i)
            q = mm(x, p["wq"]).reshape(B, L, cfg.n_heads, cfg.head_dim)
            q = apply_rope(q, cos, sin)
            # query i (at slot t0+i) attends to valid slots j <= t0+i
            # (or, under a tree chunk mask, to its ancestor chunk slots)
            attn_out = multi_head_attention(q, k_c, v_c, kv_mask=slot_mask,
                                            causal=True, q_offset=t0,
                                            impl=attn_impl,
                                            chunk_mask=chunk_attn_mask)
            h = h + mm(attn_out.reshape(B, L, cfg.n_heads * cfg.head_dim),
                       p["wo"])
            x = rms_norm(h, p["mlp_norm"], cfg.norm_eps)
            h = h + mm(jax.nn.silu(mm(x, p["w_gate"])) * mm(x, p["w_up"]),
                       p["w_down"])
            return (h, k_all, v_all, ks_all, vs_all)

        dummy = jnp.zeros((cfg.n_layers, 1, 1, 1, 1), jnp.float32)
        h, k_all, v_all, ks_all, vs_all = jax.lax.fori_loop(
            0, cfg.n_layers, body,
            (inputs_embeds, kv_cache["k"], kv_cache["v"],
             kv_cache.get("k_scale", dummy), kv_cache.get("v_scale", dummy)))
        new_cache = {"k": k_all, "v": v_all, "mask": slot_mask,
                     "len": t0 + L}
        if quant:
            new_cache["k_scale"] = ks_all
            new_cache["v_scale"] = vs_all

    h = rms_norm(h, params["final_norm"], cfg.norm_eps)
    if return_hidden:
        return h, new_cache
    logits = mm(h, params["lm_head"]).astype(logits_dtype)
    return logits, new_cache


def embed_tokens(params: Params, input_ids: jax.Array) -> jax.Array:
    return params["embed"][input_ids]


def chunked_ce_loss_and_preds(h: jax.Array, lm_head, labels: jax.Array, *,
                              chunk: int = 128):
    """Sequence-chunked shifted CE + greedy preds from final hidden states.

    Numerically identical to ``mm(h, lm_head)`` + ``cross_entropy_loss``
    (same fp32 log-softmax per position, same masked mean) but never holds
    the full [B, L, vocab] fp32 logits or their cotangent: a ``lax.scan``
    over ``chunk``-sized sequence blocks computes per-block loss partials
    under ``jax.checkpoint`` (backward re-runs one block's lm_head matmul at
    a time). At Emma-X 7B train shapes (B=2, fused 576, vocab 32064) this
    trades ~0.5 GB of peak HBM for one extra lm_head pass — the difference
    between fitting and OOMing the align-stage step on a 16 GB v5e.

    Also returns greedy ``preds [B, L]`` (argmax per position) so callers
    can compute logits-derived metrics (reference computes action accuracy
    from logits in-loop, ``base_strategy.py:402-417``) without keeping
    logits alive.
    """
    B, L, D = h.shape
    shifted = jnp.concatenate(
        [labels[:, 1:], jnp.full((B, 1), IGNORE_INDEX, labels.dtype)], axis=1)
    pad = (-L) % chunk
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        shifted = jnp.pad(shifted, ((0, 0), (0, pad)),
                          constant_values=IGNORE_INDEX)
    n = (L + pad) // chunk
    h_blocks = h.reshape(B, n, chunk, D).transpose(1, 0, 2, 3)
    l_blocks = shifted.reshape(B, n, chunk).transpose(1, 0, 2)

    # biased heads (phi: {"kernel", "bias"}) vs plain/quantized matrices
    if isinstance(lm_head, dict) and "kernel" in lm_head:
        head = lambda hb: mm(hb, lm_head["kernel"]) + lm_head["bias"]
    else:
        head = lambda hb: mm(hb, lm_head)

    @jax.checkpoint
    def one_block(hb, lb):
        logits = head(hb).astype(jnp.float32)
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        valid = lb != IGNORE_INDEX
        safe = jnp.where(valid, lb, 0)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logprobs, safe[..., None], axis=-1)[..., 0]
        return (-jnp.where(valid, ll, 0.0)).sum(), valid.sum(), preds

    def body(carry, xs):
        loss_sum, count = carry
        ls, cnt, preds = one_block(*xs)
        return (loss_sum + ls, count + cnt), preds

    (loss_sum, count), preds = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
        (h_blocks, l_blocks))
    preds = preds.transpose(1, 0, 2).reshape(B, L + pad)[:, :L]
    return loss_sum / jnp.maximum(count, 1), preds


def cross_entropy_loss(logits: jax.Array, labels: jax.Array):
    """Shifted next-token CE with IGNORE_INDEX masking (matches torch
    CrossEntropyLoss(ignore_index=-100) used by HF CausalLM)."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logprobs = jax.nn.log_softmax(shift_logits, axis=-1)
    token_ll = jnp.take_along_axis(logprobs, safe_labels[..., None],
                                   axis=-1)[..., 0]
    token_loss = -jnp.where(valid, token_ll, 0.0)
    return token_loss.sum() / jnp.maximum(valid.sum(), 1)
