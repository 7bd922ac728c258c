"""Continuous-batching engine: per-slot cursors, staggered admission, and
token parity with the static batch engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
from emmax_tpu.serving.continuous import ContinuousServingEngine
from emmax_tpu.serving.engine import GenerateOptions, ServingEngine
from emmax_tpu.vla.tokenizer import ByteLevelTokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_vlm_config(vocab_size=1024)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tok = ByteLevelTokenizer(1024)
    rng = np.random.default_rng(0)

    def pixels(n=1, seed=0):
        r = np.random.default_rng(seed)
        return {name: jnp.asarray(r.normal(size=(n, v.img_size, v.img_size, 3))
                                  .astype(np.float32))
                for name, v in cfg.vision}

    return cfg, params, tok, pixels


def _reference_tokens(cfg, params, tok, prompt, pixels, max_new):
    engine = ServingEngine(cfg, params, tok,
                           options=GenerateOptions(eos_id=tok.eos_id))
    out = engine.generate_ids([prompt], pixels, max_new_tokens=max_new)[0]
    toks = list(out)
    if tok.eos_id in toks:
        toks = toks[:toks.index(tok.eos_id)]
    return [int(t) for t in toks]


def test_single_request_matches_static_engine(setup):
    cfg, params, tok, pixels = setup
    prompt = "In: pick up the cup\nOut:"
    px = pixels(seed=1)
    ref = _reference_tokens(cfg, params, tok, prompt, px, max_new=12)
    eng = ContinuousServingEngine(cfg, params, tok, num_slots=2,
                                  cache_len=128, burst=4)
    rid = eng.submit(prompt, px, max_new_tokens=12)
    finished = eng.run_until_complete(max_steps=10)
    assert finished[rid][:len(ref)] == ref


def test_staggered_admission_same_tokens(setup):
    """Requests admitted while others are mid-decode produce the same tokens
    as running each alone — slot isolation."""
    cfg, params, tok, pixels = setup
    prompts = [f"In: task number {i}\nOut:" for i in range(4)]
    refs = []
    for i, p in enumerate(prompts):
        refs.append(_reference_tokens(cfg, params, tok, p,
                                      pixels(seed=10 + i), max_new=10))

    eng = ContinuousServingEngine(cfg, params, tok, num_slots=2,
                                  cache_len=128, burst=3)
    rids = [eng.submit(p, pixels(seed=10 + i), max_new_tokens=10)
            for i, p in enumerate(prompts)]  # 4 requests, only 2 slots
    finished = eng.run_until_complete(max_steps=40)
    assert set(finished) == set(rids)
    for rid, ref in zip(rids, refs):
        got = finished[rid][:len(ref)]
        assert got == ref, f"request {rid}: {got} != {ref}"


def test_slots_recycle(setup):
    cfg, params, tok, pixels = setup
    eng = ContinuousServingEngine(cfg, params, tok, num_slots=1,
                                  cache_len=128, burst=4)
    r1 = eng.submit("In: a\nOut:", pixels(seed=20), max_new_tokens=6)
    r2 = eng.submit("In: b\nOut:", pixels(seed=21), max_new_tokens=6)
    finished = eng.run_until_complete(max_steps=30)
    assert set(finished) == {r1, r2}
    assert len(finished[r1]) <= 6 and len(finished[r2]) <= 6

def test_per_slot_budgets_enforced_on_device(setup):
    """Mixed budgets in one pool: the short-budget slot retires at exactly
    its max_new_tokens (on-device `remaining` countdown) and frees its slot
    for the queue while the long one keeps decoding."""
    cfg, params, tok, pixels = setup
    prompt_a, prompt_b = "In: short\nOut:", "In: long\nOut:"
    px_a, px_b = pixels(seed=30), pixels(seed=31)
    ref_a = _reference_tokens(cfg, params, tok, prompt_a, px_a, max_new=3)
    ref_b = _reference_tokens(cfg, params, tok, prompt_b, px_b, max_new=16)

    eng = ContinuousServingEngine(cfg, params, tok, num_slots=2,
                                  cache_len=128, burst=4)
    ra = eng.submit(prompt_a, px_a, max_new_tokens=3)
    rb = eng.submit(prompt_b, px_b, max_new_tokens=16)
    rc = eng.submit(prompt_a, px_a, max_new_tokens=3)  # queued behind a/b

    done_after = {}
    for step in range(1, 30):
        for rid, toks in eng.step():
            done_after[rid] = (step, toks)
        if not eng.queue and not eng.running:
            break
    assert set(done_after) == {ra, rb, rc}
    # budget-3 requests emit exactly 3 tokens (no EOS in ref prefix)
    assert done_after[ra][1] == ref_a and len(ref_a) == 3
    assert done_after[rc][1] == ref_a
    assert done_after[rb][1][:len(ref_b)] == ref_b
    # the short request finished strictly before the long one, and the
    # queued one reused its slot while rb was still running
    assert done_after[ra][0] < done_after[rb][0]
    assert done_after[rc][0] <= done_after[rb][0]

def test_quantized_pool_matches_quantized_static(setup):
    """int8 KV-cache pool: tokens match the static engine's quantized-cache
    decode (same quantization points: prefill writes + per-token writes)."""
    cfg, params, tok, pixels = setup
    prompt = "In: quantized pool\nOut:"
    px = pixels(seed=40)
    static = ServingEngine(cfg, params, tok,
                           options=GenerateOptions(eos_id=tok.eos_id),
                           quantized_cache=True)
    out = static.generate_ids([prompt], px, max_new_tokens=10)[0]
    ref = [int(t) for t in out]
    if tok.eos_id in ref:
        ref = ref[:ref.index(tok.eos_id)]

    eng = ContinuousServingEngine(cfg, params, tok, num_slots=2,
                                  cache_len=128, burst=4,
                                  quantized_cache=True)
    assert "k_scale" in eng.pool and eng.pool["k"].dtype.name == "int8"
    rid = eng.submit(prompt, px, max_new_tokens=10)
    finished = eng.run_until_complete(max_steps=10)
    assert finished[rid][:len(ref)] == ref


def test_submit_rejects_overflowing_request(setup):
    cfg, params, tok, pixels = setup
    eng = ContinuousServingEngine(cfg, params, tok, num_slots=1,
                                  cache_len=64, burst=4)
    with pytest.raises(ValueError, match="cache slots"):
        eng.submit("In: pick\nOut:", pixels(), max_new_tokens=512)


def test_batched_equal_length_admission_matches_solo(setup):
    """Equal-length queued requests admit through ONE batched prefill
    (mirrors the paged engine's v4 admission); tokens must match each
    request run alone. Patches are pre-encoded so the parity contract is
    numerically stable (see CLAUDE.md / cross-jit ulp note)."""
    from emmax_tpu.serving.engine import encode_frame
    cfg, params, tok, pixels = setup
    prompts = ["In: pick the red cup\nOut:", "In: pick the blu cup\nOut:",
               "In: lift the big box\nOut:"]
    assert len({len(tok.encode(p)) for p in prompts}) == 1
    patch = [{"patches": encode_frame(params, cfg, pixels(seed=40 + i))}
             for i in range(3)]
    eng = ContinuousServingEngine(cfg, params, tok, num_slots=4,
                                  cache_len=256, burst=4)
    rids = [eng.submit(p, patch[i], max_new_tokens=8)
            for i, p in enumerate(prompts)]
    assert len(eng.queue) == 3
    eng._admit()
    assert len(eng.running) == 3 and not eng.queue  # one grouped admission
    done = eng.run_until_complete()
    for i, (rid, p) in enumerate(zip(rids, prompts)):
        ref = _reference_tokens(cfg, params, tok, p, patch[i], 8)
        assert done[rid][:len(ref)] == ref, (i, done[rid], ref)
