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


def test_return_hidden_and_chunked_ce(models):
    """ce_chunk plumbing for a Phi head (ADVICE r4): return_hidden must
    yield final-normed hiddens, and chunked_ce_loss_and_preds must apply
    the BIASED lm_head identically to the plain logits path."""
    from emmax_tpu.models.llama import (IGNORE_INDEX, chunked_ce_loss_and_preds,
                                        cross_entropy_loss)

    _, params = models
    params = jax.tree_util.tree_map(jnp.asarray, params)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, CFG.vocab_size, size=(2, 11))
    labels = np.where(rng.random((2, 11)) < 0.2, IGNORE_INDEX, ids)
    embeds = jnp.asarray(params["embed"])[jnp.asarray(ids)]
    logits, _ = phi_forward(params, CFG, embeds)
    h, _ = phi_forward(params, CFG, embeds, return_hidden=True)
    loss_c, preds = chunked_ce_loss_and_preds(
        h, params["lm_head"], jnp.asarray(labels), chunk=4)
    loss_ref = cross_entropy_loss(logits, jnp.asarray(labels))
    np.testing.assert_allclose(float(loss_c), float(loss_ref), rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(preds), np.asarray(jnp.argmax(logits, -1)))


def test_chunk_attn_mask_tree(models):
    """Tree-verify chunks on a Phi cache: verifying sibling continuations
    with an ancestor chunk mask must match verifying each path linearly."""
    from emmax_tpu.models.llama import init_kv_cache

    _, params = models
    params = jax.tree_util.tree_map(jnp.asarray, params)
    rng = np.random.default_rng(3)
    ids = rng.integers(0, CFG.vocab_size, size=(1, 6))
    embeds = jnp.asarray(params["embed"])[jnp.asarray(ids)]

    with pytest.raises(ValueError):
        phi_forward(params, CFG, embeds, chunk_attn_mask=jnp.ones((6, 6), bool))

    cache = init_kv_cache(CFG, 1, 32, dtype=jnp.float32)
    _, cache = phi_forward(params, CFG, embeds, kv_cache=cache)
    # chunk: root r plus two sibling children a, b (both at depth 1)
    r, a, b = 7, 9, 11
    chunk = jnp.asarray([[r, a, b]])
    emb = jnp.asarray(params["embed"])[chunk]
    pos = jnp.asarray([[6, 7, 7]])
    anc = jnp.asarray([[1, 0, 0], [1, 1, 0], [1, 0, 1]], bool)
    # per-row cursor form (the speculative decode path)
    cache_pr = dict(cache, len=jnp.asarray([6], jnp.int32))
    lg_tree, _ = phi_forward(params, CFG, emb, kv_cache=cache_pr,
                             positions=pos, chunk_attn_mask=anc)
    for child in (a, b):
        lin = jnp.asarray([[r, child]])
        lg_lin, _ = phi_forward(params, CFG,
                                jnp.asarray(params["embed"])[lin],
                                kv_cache=dict(cache, len=jnp.asarray([6], jnp.int32)),
                                positions=jnp.asarray([[6, 7]]))
        col = 1 if child == a else 2
        np.testing.assert_allclose(np.asarray(lg_tree[:, col]),
                                   np.asarray(lg_lin[:, 1]), atol=2e-4)
