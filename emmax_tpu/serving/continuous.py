"""Continuous-batching serving engine.

Production multi-request serving (beyond the reference, which is hard-pinned
to batch=1 — ``modeling_prismatic.py:326,460-463``): a fixed pool of KV-cache
slots; requests are admitted into free slots as they arrive and leave when
they hit EOS, so the decoder always runs as full a batch as the queue allows.
Weight reads amortize over active slots — on a v5e this multiplies aggregate
decode throughput ~4x at 8 slots.

Mechanics:
- every slot's sequence is left-aligned at cache position 0 with its own
  cursor; the decoder's cached path accepts per-row cursors (vector
  ``cache["len"]``) with per-row causal masking (``ops/attention.py``).
- admission runs a single-request multimodal prefill into a scratch cache,
  then a jitted insert copies that slot's K/V rows into the pool.
- decode runs in jitted bursts of ``burst`` tokens between scheduling
  points (admission/eviction happen on the host between bursts).
"""

from __future__ import annotations

import dataclasses
import itertools
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emmax_tpu.models.llama import embed_tokens, init_kv_cache
from emmax_tpu.serving.engine import resolve_patches
from emmax_tpu.models.vlm import (VLMConfig, fuse_multimodal,
                                  llm_apply)


_CACHE_KEYS = ("k", "v", "k_scale", "v_scale")


@partial(jax.jit, static_argnames=("cfg", "cache_len", "attn_impl",
                                   "quantized_cache"))
def _prefill_batch(params, cfg: VLMConfig, input_ids, mask, pixel_values,
                   *, cache_len: int, attn_impl: str,
                   quantized_cache: bool = False):
    """G-request multimodal prefill (EQUAL prompt lengths, all-ones masks)
    → (first_tokens [G], cache_tensors, slot_masks [G, S], used_lens [G]).

    Admission batching mirrors the paged engine: admission is
    compute-bound (ViT towers + 32 weight reads), so grouping the queue's
    equal-length head into ONE prefill amortizes it ~G×."""
    G = input_ids.shape[0]
    compute_dtype = params["llm"]["embed"].dtype
    cache = init_kv_cache(cfg.llm, G, cache_len, dtype=compute_dtype,
                          quantized=quantized_cache)
    # raw tower pixels or pre-encoded {"patches": ...} (see resolve_patches)
    patch_embeds = resolve_patches(params, cfg, pixel_values, attn_impl)
    input_embeds = embed_tokens(params["llm"], input_ids)
    embeds, fmask, _, positions = fuse_multimodal(patch_embeds, input_embeds,
                                                  mask, None)
    logits, cache = llm_apply(params["llm"], cfg.llm, embeds, mask=fmask,
                              positions=positions, kv_cache=cache,
                              attn_impl=attn_impl)
    first = jnp.argmax(logits[:, -1].astype(jnp.float32), axis=-1)
    tensors = {key: cache[key] for key in _CACHE_KEYS if key in cache}
    return (first.astype(jnp.int32), tensors, cache["mask"],
            positions[:, -1] + 1)


@partial(jax.jit, donate_argnums=(0,))
def _insert_slots(pool, slots, tensors, slot_masks, used_lens, first_toks,
                  max_new):
    """Copy a G-row prefilled cache into pool slots ``slots`` [G]."""
    pool = dict(pool)
    for key, tg in tensors.items():
        pool[key] = pool[key].at[:, slots].set(tg)
    pool["mask"] = pool["mask"].at[slots].set(slot_masks)
    pool["len"] = pool["len"].at[slots].set(used_lens.astype(jnp.int32))
    pool["cur"] = pool["cur"].at[slots].set(first_toks)
    pool["remaining"] = pool["remaining"].at[slots].set(max_new)
    pool["active"] = pool["active"].at[slots].set(True)
    return pool


@partial(jax.jit, donate_argnums=(1,),
         static_argnames=("cfg", "burst", "eos_id", "attn_impl"))
def _decode_burst(params, pool, *, cfg: VLMConfig, burst: int, eos_id: int,
                  attn_impl: str):
    """Decode ``burst`` tokens for all active slots; returns (pool, packed
    [B, burst+1] int32 — emitted tokens (eos-padded for inactive/finished
    rows) with the post-burst active flag in the last column, so the host
    reads everything it schedules on in ONE fetch (each device→host fetch
    costs ~28 ms on the remote-TPU relay)."""
    B = pool["cur"].shape[0]
    S = pool["k"].shape[2]

    def step(carry, _):
        pool = carry
        cursors = pool["len"]
        cur = pool["cur"]
        active = pool["active"]
        emb = embed_tokens(params["llm"], cur[:, None])
        cache = {key: pool[key] for key in _CACHE_KEYS if key in pool}
        cache["mask"] = pool["mask"]
        cache["len"] = jnp.minimum(cursors, S - 1)
        lg, new_cache = llm_apply(params["llm"], cfg.llm, emb,
                                  positions=cursors[:, None],
                                  kv_cache=cache, attn_impl=attn_impl)
        nxt = jnp.argmax(lg[:, 0].astype(jnp.float32), axis=-1).astype(jnp.int32)
        emitted = jnp.where(active, cur, eos_id)
        remaining = jnp.where(active, pool["remaining"] - 1,
                              pool["remaining"])
        # per-slot token budget: retire at EOS or when max_new is spent
        active = active & (cur != eos_id) & (remaining > 0)
        pool = {**{key: new_cache[key] for key in _CACHE_KEYS
                   if key in new_cache},
                "mask": new_cache["mask"],
                # advance only live rows; clamp to stay in bounds
                "len": jnp.where(active,
                                 jnp.minimum(new_cache["len"], S - 1),
                                 cursors),
                "cur": jnp.where(active, nxt, cur),
                "remaining": remaining,
                "active": active}
        return pool, emitted

    pool, emitted = jax.lax.scan(step, pool, None, length=burst)
    packed = jnp.concatenate(
        [emitted.T, pool["active"].astype(jnp.int32)[:, None]], axis=1)
    return pool, packed  # [B, burst+1]


@dataclasses.dataclass
class _Request:
    request_id: int
    prompt_ids: np.ndarray
    pixel_values: Dict
    max_new_tokens: int
    tokens: List[int] = dataclasses.field(default_factory=list)
    slot: Optional[int] = None


class ContinuousServingEngine:
    """Slot-pool continuous batching around the shared decoder."""

    def __init__(self, cfg: VLMConfig, params, tokenizer, *,
                 num_slots: int = 8, cache_len: int = 1024, burst: int = 16,
                 attn_impl: str = "xla", quantized_cache: bool = False) -> None:
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.num_slots = num_slots
        self.cache_len = cache_len
        self.burst = burst
        self.attn_impl = attn_impl
        self.quantized_cache = quantized_cache
        compute_dtype = params["llm"]["embed"].dtype
        base = init_kv_cache(cfg.llm, num_slots, cache_len,
                             dtype=compute_dtype, quantized=quantized_cache)
        self.pool = {**{key: base[key] for key in _CACHE_KEYS if key in base},
                     "mask": base["mask"],
                     "len": jnp.zeros((num_slots,), jnp.int32),
                     "cur": jnp.zeros((num_slots,), jnp.int32),
                     "remaining": jnp.zeros((num_slots,), jnp.int32),
                     "active": jnp.zeros((num_slots,), jnp.bool_)}
        self._ids = itertools.count()
        self.queue: List[_Request] = []
        self.running: Dict[int, _Request] = {}   # slot -> request
        self.finished: Dict[int, List[int]] = {}

    # -- API -------------------------------------------------------------------
    def submit(self, prompt: str, pixel_values: Dict,
               max_new_tokens: int = 512) -> int:
        rid = next(self._ids)
        ids = np.asarray([self.tokenizer.encode(prompt)], np.int32)
        # Reject up-front if the fused sequence (patches spliced after BOS
        # plus the prompt) and the decode budget cannot fit in a slot —
        # otherwise the burst would clamp the cursor at cache_len-1 and
        # silently overwrite the final KV slot while RoPE positions grow.
        fused = ids.shape[1] + self.cfg.num_patches
        need = fused + max_new_tokens
        if need > self.cache_len:
            raise ValueError(
                f"request needs {need} cache slots ({fused} fused prompt + "
                f"{max_new_tokens} new tokens) but cache_len={self.cache_len}; "
                "shorten the prompt/max_new_tokens or raise cache_len")
        self.queue.append(_Request(rid, ids, pixel_values, max_new_tokens))
        return rid

    def _admit(self) -> None:
        free = [s for s in range(self.num_slots) if s not in self.running]
        while free and self.queue:
            # one batched prefill for the queue's equal-length head (a
            # different-length request ends the group)
            lead_len = self.queue[0].prompt_ids.shape[1]
            lead_keys = set(self.queue[0].pixel_values)
            group: List[_Request] = []
            for req in self.queue:
                if (len(group) >= len(free)
                        or req.prompt_ids.shape[1] != lead_len
                        # raw pixels and pre-encoded {"patches"} requests
                        # cannot concatenate into one prefill batch
                        or set(req.pixel_values) != lead_keys):
                    break
                group.append(req)
            del self.queue[:len(group)]
            G = len(group)
            slots = [free.pop(0) for _ in range(G)]
            ids = np.concatenate([r.prompt_ids for r in group], 0)
            pixels = {k: jnp.concatenate([r.pixel_values[k] for r in group],
                                         axis=0)
                      for k in group[0].pixel_values}
            mask = jnp.ones(ids.shape, jnp.bool_)
            firsts, tensors, masks, used = _prefill_batch(
                self.params, self.cfg, jnp.asarray(ids), mask, pixels,
                cache_len=self.cache_len, attn_impl=self.attn_impl,
                quantized_cache=self.quantized_cache)
            self.pool = _insert_slots(
                self.pool, jnp.asarray(slots, np.int32), tensors, masks,
                used, firsts,
                jnp.asarray([r.max_new_tokens for r in group], np.int32))
            for req, slot in zip(group, slots):
                req.slot = slot
                self.running[slot] = req

    def step(self) -> List[Tuple[int, List[int]]]:
        """Admit + one decode burst. Returns newly finished
        (request_id, tokens) pairs."""
        self._admit()
        if not self.running:
            return []
        self.pool, packed = _decode_burst(
            self.params, self.pool, cfg=self.cfg, burst=self.burst,
            eos_id=self.tokenizer.eos_id, attn_impl=self.attn_impl)
        packed = np.asarray(packed)          # ONE fetch per burst
        emitted, active = packed[:, :-1], packed[:, -1].astype(bool)
        done_now = []
        for slot, req in list(self.running.items()):
            toks = [int(t) for t in emitted[slot]]
            for t in toks:
                if t == self.tokenizer.eos_id:
                    break
                req.tokens.append(t)
            if not active[slot]:
                self.finished[req.request_id] = req.tokens[:req.max_new_tokens]
                done_now.append((req.request_id,
                                 self.finished[req.request_id]))
                del self.running[slot]
        return done_now

    def run_until_complete(self, max_steps: int = 1000
                           ) -> Dict[int, List[int]]:
        for _ in range(max_steps):
            self.step()
            if not self.queue and not self.running:
                break
        return self.finished

    def decode_text(self, tokens: List[int]) -> str:
        return self.tokenizer.decode(tokens).strip()


@partial(jax.jit, donate_argnums=(0,), static_argnames=("slot",))
def _release_slot(pool, slot: int):
    pool = dict(pool)
    pool["active"] = pool["active"].at[slot].set(False)
    return pool
