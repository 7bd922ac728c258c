"""Numerical parity of the JAX Llama decoder vs transformers (torch CPU)."""

import numpy as np
import pytest

from emmax_tpu.models.convert import convert_hf_llama
from emmax_tpu.models.llama import (LlamaConfig, cross_entropy_loss,
                                    embed_tokens, init_kv_cache,
                                    init_llama_params, llama_forward)

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from transformers import LlamaConfig as HFLlamaConfig  # noqa: E402
from transformers import LlamaForCausalLM  # noqa: E402

CFG = LlamaConfig(vocab_size=512, dim=64, n_layers=3, n_heads=4, n_kv_heads=2,
                  hidden_dim=128, max_seq_len=128)


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    hf_cfg = HFLlamaConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.dim,
        num_hidden_layers=CFG.n_layers, num_attention_heads=CFG.n_heads,
        num_key_value_heads=CFG.n_kv_heads, intermediate_size=CFG.hidden_dim,
        max_position_embeddings=CFG.max_seq_len, rms_norm_eps=CFG.norm_eps,
        rope_theta=CFG.rope_theta, attn_implementation="eager",
        tie_word_embeddings=False)
    hf = LlamaForCausalLM(hf_cfg).eval()
    params = convert_hf_llama(hf.state_dict(), CFG)
    return hf, params


def test_logits_parity_full_sequence(models):
    hf, params = models
    rng = np.random.default_rng(0)
    ids = rng.integers(0, CFG.vocab_size, size=(2, 17))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    embeds = embed_tokens(params, jnp.asarray(ids))
    logits, _ = llama_forward(params, CFG, embeds)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=1e-3)


def test_logits_parity_with_padding_mask(models):
    hf, params = models
    rng = np.random.default_rng(1)
    ids = rng.integers(0, CFG.vocab_size, size=(2, 12))
    mask = np.ones((2, 12), bool)
    mask[1, 8:] = False  # right padding on row 1
    with torch.no_grad():
        ref = hf(torch.tensor(ids),
                 attention_mask=torch.tensor(mask.astype(np.int64))).logits.numpy()
    embeds = embed_tokens(params, jnp.asarray(ids))
    logits, _ = llama_forward(params, CFG, embeds, mask=jnp.asarray(mask),
                              positions=jnp.broadcast_to(jnp.arange(12), (2, 12)))
    # only compare valid positions (padded positions are undefined)
    np.testing.assert_allclose(np.asarray(logits)[mask], ref[mask],
                               atol=2e-4, rtol=1e-3)


def test_kv_cache_decode_matches_full_forward(models):
    _, params = models
    rng = np.random.default_rng(2)
    ids = rng.integers(0, CFG.vocab_size, size=(1, 20))
    embeds = embed_tokens(params, jnp.asarray(ids))
    full_logits, _ = llama_forward(params, CFG, embeds)

    cache = init_kv_cache(CFG, batch=1, max_len=32, dtype=jnp.float32)
    prefill_logits, cache = llama_forward(
        params, CFG, embeds[:, :10], kv_cache=cache)
    np.testing.assert_allclose(np.asarray(prefill_logits),
                               np.asarray(full_logits[:, :10]), atol=1e-4)
    # decode the remaining 10 tokens one at a time
    for t in range(10, 20):
        step_logits, cache = llama_forward(
            params, CFG, embeds[:, t:t + 1],
            positions=jnp.full((1, 1), t, jnp.int32), kv_cache=cache)
        np.testing.assert_allclose(np.asarray(step_logits[:, 0]),
                                   np.asarray(full_logits[:, t]), atol=1e-4)


def test_loss_matches_torch_cross_entropy(models):
    hf, params = models
    rng = np.random.default_rng(3)
    ids = rng.integers(0, CFG.vocab_size, size=(2, 9))
    labels = ids.copy()
    labels[:, :3] = -100
    with torch.no_grad():
        ref_loss = hf(torch.tensor(ids), labels=torch.tensor(labels)).loss.item()
    embeds = embed_tokens(params, jnp.asarray(ids))
    logits, _ = llama_forward(params, CFG, embeds)
    loss = cross_entropy_loss(logits, jnp.asarray(labels))
    assert float(loss) == pytest.approx(ref_loss, abs=1e-4)


def test_remat_same_output(models):
    _, params = models
    rng = np.random.default_rng(4)
    ids = rng.integers(0, CFG.vocab_size, size=(1, 8))
    embeds = embed_tokens(params, jnp.asarray(ids))
    a, _ = llama_forward(params, CFG, embeds, remat=False)
    b, _ = llama_forward(params, CFG, embeds, remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_lean_init_path_statistics_and_determinism():
    """Large (>=2^27-element) reduced-precision leaves take the memory-lean
    per-layer init (models/llama.py:norm01) — the whole-tensor f32 sampling
    holds 11.5 GB of temps at 7B and cannot materialize on one v5e. The
    lean path must stay deterministic per seed, well-distributed, and must
    NOT engage for f32 (golden fixtures pin the f32 values)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from emmax_tpu.models.llama import LlamaConfig, init_llama_params

    cfg = LlamaConfig(dim=4096, n_layers=4, n_heads=4, n_kv_heads=4,
                      hidden_dim=8192, vocab_size=256, max_seq_len=64)
    # w_gate [4, 4096, 8192] = 2^27 elements -> lean path for bf16
    p = init_llama_params(jax.random.PRNGKey(3), cfg, jnp.bfloat16)
    wg = p["layers"]["w_gate"]
    assert wg.shape == (4, 4096, 8192) and wg.dtype == jnp.bfloat16
    s = float(jnp.std(wg.astype(jnp.float32)))
    assert 0.019 < s < 0.021 and abs(float(jnp.mean(
        wg.astype(jnp.float32)))) < 1e-4
    p2 = init_llama_params(jax.random.PRNGKey(3), cfg, jnp.bfloat16)
    assert bool(jnp.all(p2["layers"]["w_gate"] == wg))      # deterministic
    assert not bool(jnp.all(wg[0] == wg[1]))                # per-layer keys
    # f32 keeps the exact whole-tensor path: equal to bf16-threshold-free
    # sampling on a small leaf (wq [4, 4096, 2048] < 2^27 -> exact both)
    pf = init_llama_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(pf["layers"]["wq"], np.float32),
        np.asarray(p["layers"]["wq"], np.float32), atol=0.01)
