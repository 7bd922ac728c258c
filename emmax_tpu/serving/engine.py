"""Jit-compiled autoregressive serving engine.

TPU-native replacement for the reference's HF ``GenerationMixin`` loop
(``/root/reference/prismatic/models/vlms/prismatic.py:487-664``): instead of
one Python-level forward per token, the whole greedy decode runs on-device
inside a single ``lax.while_loop`` — zero host round-trips between tokens —
with EOS early-exit masking and donated KV cache.

Static-shape discipline:
- prompts are bucketed (default 32/64/96/128/192/256 tokens) and LEFT-padded
  so each distinct (bucket, max_new_tokens) pair compiles once and is cached.
- the KV cache is sized ``patches + bucket + max_new`` rounded to 128.

The reference is restricted to batch size 1 (``modeling_prismatic.py:326``);
this engine is batched by construction.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emmax_tpu.models.llama import embed_tokens, init_kv_cache
from emmax_tpu.models.vlm import (VLMConfig, encode_images, fuse_multimodal,
                                  llm_apply)

DEFAULT_BUCKETS = (32, 64, 96, 128, 192, 256)


@dataclasses.dataclass(frozen=True)
class GenerateOptions:
    max_new_tokens: int = 512
    eos_id: int = 2
    # greedy only for now — matches reference inference (do_sample=False,
    # openvla_utils.py:216); sampling hooks can be added via temperature
    temperature: float = 0.0


def pick_bucket(length: int, buckets=DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if length <= b:
            return b
    return ((length + 127) // 128) * 128


def _round_up(n: int, m: int = 128) -> int:
    return ((n + m - 1) // m) * m


@partial(jax.jit, static_argnames=("cfg", "max_new", "cache_len", "eos_id",
                                   "attn_impl"),
         donate_argnames=())
def _generate_multimodal(params, cfg: VLMConfig, input_ids, mask,
                         pixel_values, *, max_new: int, cache_len: int,
                         eos_id: int, attn_impl: str = "xla"):
    """input_ids/mask [B, L] (left-padded) -> tokens [B, max_new] (eos-padded).

    Prefill writes the fused sequence into a fresh cache; the decode loop
    runs entirely on-device.
    """
    B, L = input_ids.shape
    compute_dtype = params["llm"]["embed"].dtype  # robust under quantization
    cache = init_kv_cache(cfg.llm, B, cache_len, dtype=compute_dtype)

    patch_embeds = encode_images(params, cfg, pixel_values, attn_impl=attn_impl)
    input_embeds = embed_tokens(params["llm"], input_ids)
    embeds, fmask, _, positions = fuse_multimodal(patch_embeds, input_embeds,
                                                  mask, None)
    logits, cache = llm_apply(params["llm"], cfg.llm, embeds, mask=fmask,
                              positions=positions, kv_cache=cache,
                              attn_impl=attn_impl)
    first_tok = jnp.argmax(logits[:, -1].astype(jnp.float32), axis=-1)
    next_pos = positions[:, -1] + 1  # per-row next rope position

    def cond(state):
        t, tok, cache, done, out = state
        return (t < max_new) & ~jnp.all(done)

    def body(state):
        t, tok, cache, done, out = state
        out = out.at[:, t].set(jnp.where(done, eos_id, tok))
        done = done | (tok == eos_id)
        emb = embed_tokens(params["llm"], tok[:, None])
        lg, new_cache = llm_apply(
            params["llm"], cfg.llm, emb,
            positions=(next_pos + t)[:, None].astype(jnp.int32),
            kv_cache=cache, attn_impl=attn_impl)
        nxt = jnp.argmax(lg[:, 0].astype(jnp.float32), axis=-1)
        return (t + 1, nxt, new_cache, done, out)

    out0 = jnp.full((B, max_new), eos_id, jnp.int32)
    state = (jnp.int32(0), first_tok.astype(jnp.int32), cache,
             jnp.zeros((B,), jnp.bool_), out0)
    t, tok, cache, done, out = jax.lax.while_loop(cond, body, state)
    return out


@partial(jax.jit, static_argnames=("cfg", "cache_len", "attn_impl"))
def _prefill_last_logits(params, cfg: VLMConfig, input_ids, mask,
                         pixel_values, *, cache_len: int,
                         attn_impl: str = "xla"):
    """Last-position logits of the multimodal prefill (for string scoring)."""
    B, L = input_ids.shape
    compute_dtype = params["llm"]["embed"].dtype
    cache = init_kv_cache(cfg.llm, B, cache_len, dtype=compute_dtype)
    patch_embeds = encode_images(params, cfg, pixel_values, attn_impl=attn_impl)
    input_embeds = embed_tokens(params["llm"], input_ids)
    embeds, fmask, _, positions = fuse_multimodal(patch_embeds, input_embeds,
                                                  mask, None)
    logits, _ = llm_apply(params["llm"], cfg.llm, embeds, mask=fmask,
                          positions=positions, kv_cache=cache,
                          attn_impl=attn_impl)
    return logits[:, -1].astype(jnp.float32)


class ServingEngine:
    """Host-side wrapper: tokenizer/bucketing/padding around the jitted loop."""

    def __init__(self, cfg: VLMConfig, params, tokenizer,
                 options: Optional[GenerateOptions] = None,
                 attn_impl: str = "auto", buckets=DEFAULT_BUCKETS) -> None:
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.options = options or GenerateOptions()
        self.attn_impl = attn_impl
        self.buckets = buckets

    def _prepare(self, prompts, suffix_ids=()) -> Tuple[jax.Array, jax.Array]:
        enc = [self.tokenizer.encode(p) + list(suffix_ids) for p in prompts]
        bucket = pick_bucket(max(len(e) for e in enc), self.buckets)
        pad = self.tokenizer.pad_id
        ids = np.full((len(enc), bucket), pad, np.int32)
        mask = np.zeros((len(enc), bucket), bool)
        for i, e in enumerate(enc):
            e = e[:bucket]
            ids[i, bucket - len(e):] = e     # LEFT pad
            mask[i, bucket - len(e):] = True
        return jnp.asarray(ids), jnp.asarray(mask)

    def generate_ids(self, prompts, pixel_values: Dict[str, jax.Array],
                     max_new_tokens: Optional[int] = None,
                     suffix_ids=()) -> np.ndarray:
        """prompts: list[str]; pixel_values: name -> [B, H, W, 3] normalized."""
        ids, mask = self._prepare(prompts, suffix_ids)
        max_new = max_new_tokens or self.options.max_new_tokens
        cache_len = _round_up(self.cfg.num_patches + ids.shape[1] + max_new)
        out = _generate_multimodal(
            self.params, self.cfg, ids, mask, pixel_values,
            max_new=max_new, cache_len=cache_len,
            eos_id=self.options.eos_id, attn_impl=self.attn_impl)
        return np.asarray(out)

    def first_token_probs(self, prompts, pixel_values,
                          candidate_ids) -> np.ndarray:
        """Normalized probabilities of candidate first generated tokens
        (reference ``generate_batch(return_string_probabilities=...)``,
        ``prismatic.py:560-593``). Returns [B, n_candidates]."""
        ids, mask = self._prepare(prompts)
        cache_len = _round_up(self.cfg.num_patches + ids.shape[1] + 8)
        logits = _prefill_last_logits(self.params, self.cfg, ids, mask,
                                      pixel_values, cache_len=cache_len,
                                      attn_impl=self.attn_impl)
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))
        sel = probs[:, np.asarray(candidate_ids)]
        return sel / sel.sum(axis=-1, keepdims=True)

    def generate(self, prompts, pixel_values,
                 max_new_tokens: Optional[int] = None):
        """Returns decoded strings with special tokens stripped."""
        out = self.generate_ids(prompts, pixel_values, max_new_tokens)
        eos = self.options.eos_id
        texts = []
        for row in out:
            row = list(row)
            if eos in row:
                row = row[:row.index(eos)]
            texts.append(self.tokenizer.decode(row).strip())
        return texts
