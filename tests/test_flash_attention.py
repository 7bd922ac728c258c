"""Flash-attention kernel parity vs the XLA reference path (interpret mode
on CPU; the same kernels compile on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emmax_tpu.ops.attention import xla_attention
from emmax_tpu.ops.flash_attention import flash_attention


def _qkv(rng, B=2, L=256, H=2, D=128, S=None):
    S = S or L
    q = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    return q, k, v


def test_forward_causal_no_mask():
    rng = np.random.default_rng(0)
    q, k, v = _qkv(rng)
    ref = xla_attention(q, k, v, causal=True)
    out = flash_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_bidirectional():
    rng = np.random.default_rng(1)
    q, k, v = _qkv(rng, L=128)
    ref = xla_attention(q, k, v, causal=False)
    out = flash_attention(q, k, v, causal=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_with_left_padding_mask():
    rng = np.random.default_rng(2)
    q, k, v = _qkv(rng, B=2, L=256)
    kv_mask = np.ones((2, 256), bool)
    kv_mask[0, :64] = False    # left padding row 0
    kv_mask[1, :130] = False
    kv_mask = jnp.asarray(kv_mask)
    ref = xla_attention(q, k, v, kv_mask=kv_mask, causal=True)
    out = flash_attention(q, k, v, kv_mask=kv_mask, causal=True)
    # compare only valid rows (masked-query rows are garbage in both)
    m = np.asarray(kv_mask)
    np.testing.assert_allclose(np.asarray(out)[m], np.asarray(ref)[m],
                               atol=2e-5)


def test_forward_non_multiple_lengths():
    """Ragged lengths (e.g. fused 320-token sequences) are padded internally."""
    rng = np.random.default_rng(3)
    q, k, v = _qkv(rng, L=320)
    ref = xla_attention(q, k, v, causal=True)
    out = flash_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_rectangular_cached_prefill():
    """Queries attend into a longer KV cache with only the first L slots
    valid (fresh-cache prefill shape)."""
    rng = np.random.default_rng(4)
    L, S = 128, 384
    q, k, v = _qkv(rng, B=1, L=L, S=S)
    kv_mask = jnp.asarray(np.arange(S)[None, :] < L)
    ref = xla_attention(q, k, v, kv_mask=kv_mask, causal=True, q_offset=0)
    out = flash_attention(q, k, v, kv_mask=kv_mask, causal=True, q_offset=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_q_offset():
    """Continuation chunk: 128 queries starting at absolute position 128 of
    a 256-slot cache."""
    rng = np.random.default_rng(5)
    q, k, v = _qkv(rng, B=1, L=128, S=256)
    kv_mask = jnp.asarray(np.ones((1, 256), bool))
    ref = xla_attention(q, k, v, kv_mask=kv_mask, causal=True, q_offset=128)
    out = flash_attention(q, k, v, kv_mask=kv_mask, causal=True, q_offset=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_decode_fallback():
    rng = np.random.default_rng(6)
    q, k, v = _qkv(rng, B=2, L=1, S=256)
    kv_mask = jnp.asarray(np.ones((2, 256), bool))
    ref = xla_attention(q, k, v, kv_mask=kv_mask, causal=True, q_offset=255)
    out = flash_attention(q, k, v, kv_mask=kv_mask, causal=True, q_offset=255)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_gradients_match_xla():
    rng = np.random.default_rng(7)
    q, k, v = _qkv(rng, B=1, L=256, H=1)
    kv_mask = np.ones((1, 256), bool)
    kv_mask[0, :32] = False
    kv_mask = jnp.asarray(kv_mask)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, kv_mask=kv_mask, causal=True)
        return jnp.sum(jnp.where(kv_mask[..., None, None], o, 0.0) ** 2)

    def loss_xla(q, k, v):
        o = xla_attention(q, k, v, kv_mask=kv_mask, causal=True)
        return jnp.sum(jnp.where(kv_mask[..., None, None], o, 0.0) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   err_msg=f"d{name}")


def test_gradients_bidirectional():
    rng = np.random.default_rng(8)
    q, k, v = _qkv(rng, B=1, L=128, H=2)

    def loss(fn):
        def f(q, k, v):
            return jnp.sum(fn(q, k, v) ** 2)
        return f

    ff = lambda q, k, v: flash_attention(q, k, v, causal=False)
    fx = lambda q, k, v: xla_attention(q, k, v, causal=False)
    gf = jax.grad(loss(ff), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss(fx), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_llama_forward_pallas_impl_matches_xla():
    """Whole-model integration: llama_forward(attn_impl='pallas')."""
    from emmax_tpu.models.llama import (LlamaConfig, embed_tokens,
                                        init_llama_params, llama_forward)

    cfg = LlamaConfig(vocab_size=256, dim=256, n_layers=2, n_heads=2,
                      n_kv_heads=2, hidden_dim=512, max_seq_len=256)
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(9)
    ids = rng.integers(0, 256, size=(1, 64))
    embeds = embed_tokens(params, jnp.asarray(ids))
    ref, _ = llama_forward(params, cfg, embeds, attn_impl="xla")
    out, _ = llama_forward(params, cfg, embeds, attn_impl="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4,
                               rtol=1e-3)


@pytest.mark.parametrize("causal", [True, False])
def test_fused_bwd_matches_separate(causal):
    """fused_bwd=True (dq folded into the dkv kernel, per-kv-block partials)
    must match the separate-pass gradients across multiple kv blocks,
    including causally-skipped tiles and a padding mask."""
    rng = np.random.default_rng(9)
    q, k, v = _qkv(rng, B=1, L=512, H=2)
    kv_mask = np.ones((1, 512), bool)
    kv_mask[0, :40] = False
    kv_mask = jnp.asarray(kv_mask)

    def loss(fused):
        def f(q, k, v):
            o = flash_attention(q, k, v, kv_mask=kv_mask, causal=causal,
                                block_q=128, block_k=128, block_q_bwd=128,
                                block_k_bwd=128, fused_bwd=fused)
            return jnp.sum(jnp.where(kv_mask[..., None, None], o, 0.0) ** 2)
        return f

    gf = jax.grad(loss(True), argnums=(0, 1, 2))(q, k, v)
    gs = jax.grad(loss(False), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gs, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   err_msg=f"d{name}")


def test_fused_bwd_q_offset_and_padding():
    """Rectangular cached-prefill shape with non-multiple lengths: fused
    gradients match XLA autodiff through the padding wrapper."""
    rng = np.random.default_rng(10)
    q, k, v = _qkv(rng, B=1, L=200, H=1, S=392)
    kv_mask = jnp.asarray(np.ones((1, 392), bool))

    def loss(fn):
        def f(q, k, v):
            return jnp.sum(fn(q, k, v) ** 2)
        return f

    ff = lambda q, k, v: flash_attention(
        q, k, v, kv_mask=kv_mask, causal=True, q_offset=192,
        block_q=128, block_k=128, block_q_bwd=128, block_k_bwd=128,
        fused_bwd=True)
    fx = lambda q, k, v: xla_attention(q, k, v, kv_mask=kv_mask, causal=True,
                                       q_offset=192)
    gf = jax.grad(loss(ff), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss(fx), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   err_msg=f"d{name}")


def test_llama_grads_pallas_fused_impl_matches_xla():
    """Training-path integration: grads through llama_forward with
    attn_impl='pallas_fused' (fused dq-in-dkv backward) match the XLA
    attention path."""
    from emmax_tpu.models.llama import (LlamaConfig, embed_tokens,
                                        init_llama_params, llama_forward)

    cfg = LlamaConfig(vocab_size=256, dim=256, n_layers=2, n_heads=2,
                      n_kv_heads=2, hidden_dim=512, max_seq_len=256)
    params = init_llama_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(11)
    ids = jnp.asarray(rng.integers(0, 256, size=(1, 64)))

    def loss(impl):
        def f(params):
            embeds = embed_tokens(params, ids)
            lg, _ = llama_forward(params, cfg, embeds, attn_impl=impl)
            return jnp.mean(lg.astype(jnp.float32) ** 2)
        return f

    gx = jax.grad(loss("xla"))(params)
    gf = jax.grad(loss("pallas_fused"))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=2e-3)
