import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emmax_tpu.models.llama import embed_tokens, init_kv_cache, llama_forward
from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config, vlm_forward
from emmax_tpu.serving.engine import (GenerateOptions, ServingEngine,
                                      pick_bucket)
from emmax_tpu.vla.tokenizer import ByteLevelTokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_vlm_config(vocab_size=512)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tok = ByteLevelTokenizer(vocab_size=512)
    engine = ServingEngine(cfg, params, tok,
                           options=GenerateOptions(eos_id=tok.eos_id))
    return cfg, params, tok, engine


def _pixels(cfg, rng, B):
    return {name: jnp.asarray(rng.normal(size=(B, v.img_size, v.img_size, 3))
                              .astype(np.float32)) for name, v in cfg.vision}


def _manual_greedy(cfg, params, tok, prompt, pixels_1, max_new):
    """Reference loop: unpadded prefill + per-token decode."""
    ids = np.array([tok.encode(prompt)])
    cache = init_kv_cache(cfg.llm, 1, 256, dtype=jnp.float32)
    logits, _, cache = vlm_forward(params, cfg, jnp.asarray(ids), pixels_1,
                                   kv_cache=cache)
    cur = int(np.argmax(np.asarray(logits)[0, -1]))
    out = []
    pos = ids.shape[1] + cfg.num_patches
    for t in range(max_new):
        out.append(cur)
        if cur == tok.eos_id:
            break
        emb = embed_tokens(params["llm"], jnp.asarray([[cur]]))
        lg, cache = llama_forward(params["llm"], cfg.llm, emb,
                                  positions=jnp.full((1, 1), pos + t, jnp.int32),
                                  kv_cache=cache)
        cur = int(np.argmax(np.asarray(lg)[0, 0]))
    return out


def test_engine_matches_manual_greedy(setup):
    cfg, params, tok, engine = setup
    rng = np.random.default_rng(0)
    pixels = _pixels(cfg, rng, 1)
    prompt = "In: do the thing\nOut:"
    manual = _manual_greedy(cfg, params, tok, prompt, pixels, max_new=8)
    out = engine.generate_ids([prompt], pixels, max_new_tokens=8)[0]
    got = list(out)
    if tok.eos_id in manual:
        n = manual.index(tok.eos_id) + 1
        manual, got = manual[:n], got[:n]
    assert got[:len(manual)] == manual


def test_batched_left_padding_matches_individual(setup):
    """Rows of different prompt lengths decode identically to running each
    alone — validates the per-row BOS splice + positions under left-pad."""
    cfg, params, tok, engine = setup
    rng = np.random.default_rng(1)
    prompts = ["In: a\nOut:", "In: a much longer instruction here\nOut:"]
    pixels2 = _pixels(cfg, rng, 2)
    batch_out = engine.generate_ids(prompts, pixels2, max_new_tokens=6)
    for i, p in enumerate(prompts):
        pixels1 = {k: v[i:i + 1] for k, v in pixels2.items()}
        solo = engine.generate_ids([p], pixels1, max_new_tokens=6)[0]
        np.testing.assert_array_equal(batch_out[i], solo)


def test_eos_early_stop_padding(setup):
    cfg, params, tok, engine = setup
    rng = np.random.default_rng(2)
    out = engine.generate_ids(["In: x\nOut:"], _pixels(cfg, rng, 1),
                              max_new_tokens=16)[0]
    # after the first EOS, everything is EOS
    if tok.eos_id in list(out):
        i = list(out).index(tok.eos_id)
        assert (out[i:] == tok.eos_id).all()


def test_pick_bucket():
    assert pick_bucket(10) == 32
    assert pick_bucket(64) == 64
    assert pick_bucket(65) == 96
    assert pick_bucket(500) == 512


def test_generate_text_strips_eos(setup):
    cfg, params, tok, engine = setup
    rng = np.random.default_rng(3)
    texts = engine.generate(["In: x\nOut:"], _pixels(cfg, rng, 1),
                            max_new_tokens=8)
    assert isinstance(texts[0], str)
