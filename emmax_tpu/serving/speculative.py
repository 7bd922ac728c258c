"""Self-speculative (prompt-lookup) greedy decoding.

Batch-1 greedy decode is weight-bandwidth-bound: every decoded token streams
all ~7B weights through HBM. Verifying a K-token draft costs nearly the same
HBM traffic as decoding one token (the [K+1, D] activations ride along for
free on the MXU), so any accepted draft token is a ~free extra token.

Drafts come from *prompt lookup* (n-gram continuation): match the last
bigram of the generated-so-far history against the prompt + prior output and
propose the K tokens that followed the most recent match. Emma-X GCOT output
is highly repetitive — per-segment scaffolding ("NEXT GRIPPER POSITION:",
"NEXT MOVEMENT:", "NEXT POLICIES:") and action-token runs recur across
segments — so lookup hits are frequent. No draft model, no extra weights.

Greedy output is exact by construction: emitted tokens are always the
verifier's own argmax; drafts only decide how many verifier tokens each
chunk yields. The reference has no speculative path (HF ``generate``,
``/root/reference/prismatic/models/vlms/prismatic.py:487-664``) — this is a
beyond-reference capability.

The whole decode runs in ONE jitted ``lax.while_loop`` (like
``engine._generate_multimodal``), using the per-row cache-cursor path of
``llama_forward`` (chunk written at slots ``[t0, t0+K+1)``, causal attention
with per-row ``q_offset``); rejected slots are invalidated by rewinding the
slot mask + cursor, then overwritten by the next chunk.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emmax_tpu.models.llama import embed_tokens, init_kv_cache
from emmax_tpu.models.vlm import VLMConfig, fuse_multimodal, llm_apply
from emmax_tpu.serving.engine import ServingEngine, _round_up, resolve_patches


def lookup_draft(hist: jax.Array, hlen: jax.Array, k: int) -> jax.Array:
    """Prompt-lookup draft: continuation of the most recent bigram match.

    hist [B, H] token history (-1 sentinel beyond ``hlen``), hlen [B] valid
    counts. Matches ``hist[hlen-2:hlen]`` against every earlier bigram and
    returns the ``k`` tokens following the latest match, or all -1 when no
    match exists (every -1 draft token is rejected by verification, so the
    step degrades gracefully to ordinary one-token decode).
    """
    B, H = hist.shape
    last2 = jnp.stack(
        [jnp.take_along_axis(hist, jnp.clip(hlen - 2, 0)[:, None], 1)[:, 0],
         jnp.take_along_axis(hist, jnp.clip(hlen - 1, 0)[:, None], 1)[:, 0]],
        axis=-1)                                                   # [B, 2]
    idx = jnp.arange(H - 1)
    m = (hist[:, :-1] == last2[:, :1]) & (hist[:, 1:] == last2[:, 1:2])
    # exclude the trailing bigram itself and anything beyond valid history
    m = m & (idx[None, :] < (hlen - 2)[:, None])
    jbest = jnp.max(jnp.where(m, idx[None, :], -1), axis=-1)       # [B]
    start = jnp.clip(jbest + 2, 0, H - k)
    draft = jax.vmap(
        lambda h, s: jax.lax.dynamic_slice(h, (s,), (k,)))(hist, start)
    return jnp.where((jbest >= 0)[:, None], draft, -1)


@partial(jax.jit, static_argnames=("cfg", "max_new", "cache_len", "eos_id",
                                   "attn_impl", "k", "quantized_cache"))
def _generate_speculative(params, cfg: VLMConfig, input_ids, mask,
                          pixel_values, forced, draft_ctx, *, max_new: int,
                          cache_len: int, eos_id: int, attn_impl: str = "xla",
                          k: int = 8, quantized_cache: bool = False):
    """input_ids/mask [B, L] (left-padded) -> (tokens [B, max_new], steps).

    ``steps`` is the number of verifier forwards; ``emitted / steps`` is the
    mean accepted-tokens-per-step (1.0 = no speculation wins).

    ``draft_ctx`` (optional [B, C] int32, -1 padded): extra tokens seeded
    into the lookup history BEFORE the prompt — they are never attended or
    emitted, they only feed drafting. In the closed robot loop the previous
    frame's GCOT output is the natural context: consecutive frames decode
    nearly identical text, so cross-frame lookup drafts get long accepts
    (the reference decodes every frame from scratch,
    ``run_bridgev2_eval.py:149-199``).

    ``forced`` (optional [B, >= max_new + 2k+2] int32): teacher-forced
    verifier outputs for benchmarking — every verifier forward still runs
    (true HBM cost) but its argmax is replaced by the given stream, so the
    measured acceptance is the TRUE prompt-lookup hit rate on that stream
    (e.g. a representative GCOT text) instead of an artifact of the loaded
    weights. Output then equals the forced stream.
    """
    B, L = input_ids.shape
    compute_dtype = params["llm"]["embed"].dtype
    cache = init_kv_cache(cfg.llm, B, cache_len, dtype=compute_dtype,
                          quantized=quantized_cache)

    patch_embeds = resolve_patches(params, cfg, pixel_values, attn_impl)
    input_embeds = embed_tokens(params["llm"], input_ids)
    embeds, fmask, _, positions = fuse_multimodal(patch_embeds, input_embeds,
                                                  mask, None)
    logits, cache = llm_apply(params["llm"], cfg.llm, embeds, mask=fmask,
                              positions=positions, kv_cache=cache,
                              attn_impl=attn_impl)
    first_tok = jnp.argmax(logits[:, -1].astype(jnp.float32), -1).astype(jnp.int32)
    if forced is not None:
        first_tok = forced[:, 0]
    P = embeds.shape[1]
    # switch the cache to per-row cursors (continuous-batching path)
    cache = dict(cache, len=jnp.full((B,), P, jnp.int32))
    cur_pos = (positions[:, -1] + 1).astype(jnp.int32)             # [B]

    K1 = k + 1
    C = 0 if draft_ctx is None else draft_ctx.shape[1]
    H = C + L + max_new + 2 * K1      # history buffer (slack for full-window writes)
    OUT = max_new + 2 * K1
    plen = mask.sum(-1).astype(jnp.int32)
    # left-shift the left-padded prompt so history is front-aligned
    hist0 = jax.vmap(lambda row, s: jnp.roll(row, -s))(
        jnp.where(mask, input_ids, -1), L - plen)
    if draft_ctx is None:
        hist = jnp.full((B, H), -1, jnp.int32).at[:, :L].set(hist0)
        hlen = plen
    else:
        # compact [ctx | prompt] front-aligned per row (ctx is -1-padded on
        # the right, prompt tokens sit at hist0[:, :plen])
        clen = jnp.sum(draft_ctx >= 0, axis=1).astype(jnp.int32)
        pos = jnp.arange(H)

        def merge(ctx_row, prompt_row, c):
            ctx_g = ctx_row[jnp.clip(pos, 0, C - 1)]
            pr_g = prompt_row[jnp.clip(pos - c, 0, L - 1)]
            return jnp.where(pos < c, ctx_g,
                             jnp.where(pos < c + L, pr_g, -1))

        hist = jax.vmap(merge)(draft_ctx, hist0, clen)
        hlen = clen + plen
    # loop invariant: `tok` (next chunk's first input) is already emitted and
    # appended to history — seed both with the prefill's first token
    hist = hist.at[jnp.arange(B), hlen].set(first_tok)
    hlen = hlen + 1

    out0 = jnp.full((B, OUT), eos_id, jnp.int32).at[:, 0].set(first_tok)
    out_len0 = jnp.ones((B,), jnp.int32)
    done0 = (first_tok == eos_id) | (max_new <= 1)
    # `chk` keeps the verifier logits LIVE under teacher forcing — without
    # it the forced targets make every forward dead code and XLA deletes
    # the whole transformer from the loop (measured: 121 "steps" in 55 ms).
    chk0 = jnp.zeros((), jnp.float32)
    state = (jnp.int32(0), first_tok, cache, hist, hlen, out0, out_len0,
             cur_pos, done0, chk0)

    def cond(state):
        steps, *rest = state
        done = rest[-2]
        return (steps < max_new) & ~jnp.all(done)

    def body(state):
        (steps, tok, cache, hist, hlen, out, out_len, cur_pos, done,
         chk) = state
        t0 = cache["len"]                                          # [B]
        draft = lookup_draft(hist, hlen, k)                        # [B, k]
        chunk = jnp.concatenate([tok[:, None], draft], axis=1)    # [B, k+1]
        pos = cur_pos[:, None] + jnp.arange(K1, dtype=jnp.int32)[None, :]
        emb = embed_tokens(params["llm"], jnp.clip(chunk, 0))
        lg, new_cache = llm_apply(params["llm"], cfg.llm, emb, positions=pos,
                                  kv_cache=cache, attn_impl=attn_impl)
        targets = jnp.argmax(lg.astype(jnp.float32), -1).astype(jnp.int32)
        if forced is not None:
            # teacher-forced stream: targets[i] = forced[out_len + i]
            targets = jax.vmap(lambda f, s: jax.lax.dynamic_slice(
                f, (s,), (K1,)))(forced, out_len)
            # full-tensor sum so every lm_head column/position stays live
            chk = chk + jnp.sum(lg.astype(jnp.float32))
        # accept the longest draft prefix the verifier agrees with
        acc = jnp.cumprod((draft == targets[:, :k]).astype(jnp.int32), axis=-1)
        e = acc.sum(-1) + 1                                        # [B] in [1, k+1]
        # clamp emission at the first EOS the verifier produced
        pos_idx = jnp.arange(K1)
        is_eos = (targets == eos_id) & (pos_idx[None, :] < e[:, None])
        any_eos = is_eos.any(-1)
        e = jnp.where(any_eos, jnp.argmax(is_eos, -1) + 1, e)
        e = jnp.where(done, 0, e).astype(jnp.int32)
        # rewind the cache over rejected slots: keep [t0, t0+e) only
        S = new_cache["k"].shape[2]
        slots = jnp.arange(S)
        keep = ((slots[None, :] >= t0[:, None])
                & (slots[None, :] < (t0 + e)[:, None]))
        new_cache = dict(new_cache, mask=cache["mask"] | keep, len=t0 + e)
        # emit; done rows park their (ignored) window write past max_new
        wstart = jnp.where(done, OUT - K1, out_len)
        out = jax.vmap(lambda o, tg, s: jax.lax.dynamic_update_slice(
            o, tg, (s,)))(out, targets, wstart)
        hstart = jnp.where(done, H - K1, hlen)
        hist = jax.vmap(lambda h, tg, s: jax.lax.dynamic_update_slice(
            h, tg, (s,)))(hist, targets, hstart)
        next_tok = jnp.take_along_axis(
            targets, jnp.clip(e - 1, 0)[:, None], 1)[:, 0]
        out_len = out_len + e
        done = done | any_eos | (out_len >= max_new)
        return (steps + 1, next_tok, new_cache, hist, hlen + e, out,
                out_len, cur_pos + e, done, chk)

    (steps, _, _, _, _, out, out_len, _, _, chk) = jax.lax.while_loop(
        cond, body, state)
    out = jnp.where(jnp.arange(OUT)[None, :] < out_len[:, None], out, eos_id)
    return out[:, :max_new], steps, chk


class SpeculativeEngine(ServingEngine):
    """ServingEngine with prompt-lookup speculative greedy decoding.

    ``draft_k`` draft tokens are verified per forward; greedy output is
    identical to ``ServingEngine`` (temperature > 0 is not supported).
    ``last_steps`` after a call holds the verifier-forward count for
    acceptance-rate accounting.
    """

    def __init__(self, *args, draft_k: int = 8, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        if self.options.temperature != 0.0:
            raise ValueError("SpeculativeEngine is greedy-only")
        self.draft_k = draft_k
        self.last_steps: Optional[int] = None

    def generate_ids(self, prompts, pixel_values: Dict[str, jax.Array],
                     max_new_tokens: Optional[int] = None,
                     suffix_ids=(), forced_tokens=None,
                     draft_context=None) -> np.ndarray:
        """``forced_tokens`` ([B, T] or [T]): teacher-forced verifier stream
        for acceptance benchmarking (see ``_generate_speculative``).

        ``draft_context`` ([B, C] or [C]): draft-only token history seeded
        before the prompt — pass the previous closed-loop frame's output for
        cross-frame speculation. Padded to a 128 multiple (one executable
        per size bucket)."""
        ids, mask = self._prepare(prompts, suffix_ids)
        max_new = max_new_tokens or self.options.max_new_tokens
        cache_len = _round_up(self.cfg.num_patches + ids.shape[1] + max_new
                              + self.draft_k + 1)
        ctx = None
        if draft_context is not None:
            ctx = np.asarray(draft_context, np.int32)
            if ctx.ndim == 1:
                ctx = np.tile(ctx[None], (len(prompts), 1))
            C = _round_up(max(ctx.shape[1], 1))
            pad = np.full((ctx.shape[0], C - ctx.shape[1]), -1, np.int32)
            ctx = jnp.asarray(np.concatenate([ctx, pad], axis=1))
        forced = None
        if forced_tokens is not None:
            forced = np.asarray(forced_tokens, np.int32)
            if forced.ndim == 1:
                forced = np.tile(forced[None], (len(prompts), 1))
            need = max_new + 2 * (self.draft_k + 1) + 2
            if forced.shape[1] < need:
                pad = np.full((forced.shape[0], need - forced.shape[1]),
                              self.options.eos_id, np.int32)
                forced = np.concatenate([forced, pad], axis=1)
            forced = jnp.asarray(forced)
        out, steps, _chk = _generate_speculative(
            self.params, self.cfg, ids, mask, self._vision_input(pixel_values),
            forced, ctx, max_new=max_new, cache_len=cache_len,
            eos_id=self.options.eos_id, attn_impl=self.attn_impl,
            k=self.draft_k, quantized_cache=self.quantized_cache)
        self.last_steps = int(steps)
        return np.asarray(out)
