"""Int8 KV-cache: numerics close to bf16 cache, greedy mostly stable."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emmax_tpu.models.llama import (LlamaConfig, embed_tokens, init_kv_cache,
                                    llama_forward)
from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
from emmax_tpu.serving.engine import GenerateOptions, ServingEngine
from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

CFG = LlamaConfig(vocab_size=256, dim=64, n_layers=2, n_heads=4, n_kv_heads=4,
                  hidden_dim=128, max_seq_len=64)


def test_quantized_cache_close_to_dense():
    from emmax_tpu.models.llama import init_llama_params

    params = init_llama_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 256, size=(1, 12))
    embeds = embed_tokens(params, jnp.asarray(ids))

    dense = init_kv_cache(CFG, 1, 32, dtype=jnp.float32)
    ref, dense = llama_forward(params, CFG, embeds, kv_cache=dense)

    qcache = init_kv_cache(CFG, 1, 32, quantized=True)
    assert qcache["k"].dtype == jnp.int8
    out, qcache = llama_forward(params, CFG, embeds, kv_cache=qcache)
    assert qcache["k_scale"].shape == (2, 1, 32, 4, 1)
    rel = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert rel < 0.05, rel
    # decode continues through the quantized cache
    step, qcache = llama_forward(params, CFG, embeds[:, -1:],
                                 positions=jnp.full((1, 1), 12, jnp.int32),
                                 kv_cache=qcache)
    assert np.isfinite(np.asarray(step)).all()


def test_engine_quantized_cache_generates_same_early_tokens():
    cfg = tiny_vlm_config(1024)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tok = ByteLevelTokenizer(1024)
    rng = np.random.default_rng(1)
    pixels = {n: jnp.asarray(rng.normal(size=(1, v.img_size, v.img_size, 3))
                             .astype(np.float32)) for n, v in cfg.vision}
    ref_engine = ServingEngine(cfg, params, tok,
                               options=GenerateOptions(eos_id=tok.eos_id))
    q_engine = ServingEngine(cfg, params, tok,
                             options=GenerateOptions(eos_id=tok.eos_id),
                             quantized_cache=True)
    ref = ref_engine.generate_ids(["In: go\nOut:"], pixels, max_new_tokens=8)
    got = q_engine.generate_ids(["In: go\nOut:"], pixels, max_new_tokens=8)
    # int8 cache rounding may flip low-margin tokens late; the first token
    # comes straight from the prefill and must agree
    assert got[0][0] == ref[0][0]
    assert got.shape == ref.shape

