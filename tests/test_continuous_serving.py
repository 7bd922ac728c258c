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
