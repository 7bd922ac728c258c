"""Int8 weight-only quantization: error bounds + quantized decode works."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emmax_tpu.models.llama import (LlamaConfig, embed_tokens,
                                    init_llama_params, llama_forward)
from emmax_tpu.serving.quant import (dequantize_weight, quantize_llm_params,
                                     quantize_vlm_params, quantize_weight)

CFG = LlamaConfig(vocab_size=256, dim=64, n_layers=2, n_heads=4, n_kv_heads=4,
                  hidden_dim=128, max_seq_len=64)


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(scale=0.02, size=(4, 64, 128)).astype(np.float32))
    qw = quantize_weight(w)
    assert qw["q8"].dtype == jnp.int8
    assert qw["scale"].shape == (4, 1, 128)
    back = dequantize_weight(qw)
    # per-channel int8: max error is scale/2 = absmax/254
    err = np.abs(np.asarray(back - w))
    bound = np.asarray(qw["scale"]) / 2 + 1e-8
    assert (err <= bound).all()


def test_quantized_logits_close_and_greedy_stable():
    params = init_llama_params(jax.random.PRNGKey(0), CFG)
    qparams = quantize_llm_params(params)
    assert qparams["layers"]["wq"]["q8"].dtype == jnp.int8
    assert not isinstance(qparams["layers"]["attn_norm"], dict)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 256, size=(1, 16))
    embeds = embed_tokens(params, jnp.asarray(ids))
    ref, _ = llama_forward(params, CFG, embeds)
    out, _ = llama_forward(qparams, CFG, embeds)
    # relative logit error small; greedy tokens mostly unchanged
    rel = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert rel < 0.1
    agree = (jnp.argmax(out, -1) == jnp.argmax(ref, -1)).mean()
    assert float(agree) > 0.8


def test_quantized_engine_generates():
    from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
    from emmax_tpu.serving.engine import GenerateOptions, ServingEngine
    from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

    cfg = tiny_vlm_config(512)
    params = quantize_vlm_params(init_vlm_params(jax.random.PRNGKey(0), cfg))
    tok = ByteLevelTokenizer(512)
    engine = ServingEngine(cfg, params, tok,
                           options=GenerateOptions(eos_id=tok.eos_id))
    rng = np.random.default_rng(2)
    pixels = {name: jnp.asarray(rng.normal(size=(1, v.img_size, v.img_size, 3))
                                .astype(np.float32))
              for name, v in cfg.vision}
    out = engine.generate_ids(["In: go\nOut:"], pixels, max_new_tokens=6)
    assert out.shape == (1, 6)


def test_quantized_phi_forward_and_cached_decode():
    """Phi weight applications go through mm(): int8-quantized phi params
    must trace and stay close to fp (regression for the raw-@ crash)."""
    from emmax_tpu.models.phi import PhiConfig, init_phi_params, phi_forward

    cfg = PhiConfig(vocab_size=256, dim=64, n_layers=2, n_heads=4,
                    n_kv_heads=4, hidden_dim=128, max_seq_len=64)
    params = init_phi_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_llm_params(params)
    assert qparams["layers"]["w1"]["q8"].dtype == jnp.int8
    assert qparams["layers"]["w2"]["q8"].dtype == jnp.int8
    assert qparams["lm_head"]["kernel"]["q8"].dtype == jnp.int8
    assert not isinstance(qparams["layers"]["bq"], dict)

    rng = np.random.default_rng(3)
    embeds = jnp.asarray(rng.normal(scale=0.1, size=(1, 8, 64))
                         .astype(np.float32))
    ref, _ = phi_forward(params, cfg, embeds)
    out, _ = phi_forward(qparams, cfg, embeds)
    rel = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert rel < 0.1

    # cached decode path with quantized weights traces + runs
    from emmax_tpu.models.llama import init_kv_cache
    cache = init_kv_cache(cfg, 1, 16, dtype=jnp.float32)
    logits, cache = phi_forward(qparams, cfg, embeds, kv_cache=cache)
    step, cache = phi_forward(qparams, cfg, embeds[:, -1:], kv_cache=cache)
    assert step.shape == (1, 1, 256)
