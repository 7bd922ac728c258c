"""Phi-2 decoder parity vs transformers PhiForCausalLM (torch CPU)."""

import numpy as np
import pytest

from emmax_tpu.models.phi import (PhiConfig, convert_hf_phi, init_phi_params,
                                  phi_forward)

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

CFG = PhiConfig(vocab_size=256, dim=80, n_layers=2, n_heads=4, n_kv_heads=4,
                hidden_dim=160, max_seq_len=64)


@pytest.fixture(scope="module")
def models():
    from transformers import PhiConfig as HFPhiConfig
    from transformers import PhiForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFPhiConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.dim,
        num_hidden_layers=CFG.n_layers, num_attention_heads=CFG.n_heads,
        num_key_value_heads=CFG.n_kv_heads, intermediate_size=CFG.hidden_dim,
        max_position_embeddings=CFG.max_seq_len,
        partial_rotary_factor=CFG.partial_rotary_factor,
        rope_theta=CFG.rope_theta, layer_norm_eps=CFG.norm_eps,
        attn_implementation="eager", tie_word_embeddings=False)
    hf = PhiForCausalLM(hf_cfg).eval()
    params = convert_hf_phi(hf.state_dict(), CFG)
    return hf, params


def test_logits_parity(models):
    hf, params = models
    rng = np.random.default_rng(0)
    ids = rng.integers(0, CFG.vocab_size, size=(2, 13))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    embeds = jnp.asarray(params["embed"])[jnp.asarray(ids)]
    logits, _ = phi_forward(
        jax.tree_util.tree_map(jnp.asarray, params), CFG, embeds)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=3e-4, rtol=1e-3)


def test_kv_cache_decode(models):
    from emmax_tpu.models.llama import init_kv_cache

    _, params = models
    params = jax.tree_util.tree_map(jnp.asarray, params)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, CFG.vocab_size, size=(1, 12))
    embeds = jnp.asarray(params["embed"])[jnp.asarray(ids)]
    full, _ = phi_forward(params, CFG, embeds)
    cache = init_kv_cache(CFG, 1, 32, dtype=jnp.float32)
    pre, cache = phi_forward(params, CFG, embeds[:, :8], kv_cache=cache)
    np.testing.assert_allclose(np.asarray(pre), np.asarray(full[:, :8]),
                               atol=1e-4)
    for t in range(8, 12):
        lg, cache = phi_forward(params, CFG, embeds[:, t:t + 1],
                                positions=jnp.full((1, 1), t, jnp.int32),
                                kv_cache=cache)
        np.testing.assert_allclose(np.asarray(lg[:, 0]),
                                   np.asarray(full[:, t]), atol=1e-4)
