import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emmax_tpu.models.llama import IGNORE_INDEX, init_kv_cache, llama_forward
from emmax_tpu.models.vlm import (encode_images, fuse_multimodal,
                                  init_vlm_params, text_forward,
                                  tiny_vlm_config, vlm_forward)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_vlm_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _batch(cfg, rng, B=2, L=10):
    ids = rng.integers(3, cfg.llm.vocab_size, size=(B, L))
    ids[:, 0] = 1  # BOS
    pixels = {name: rng.normal(size=(B, vcfg.img_size, vcfg.img_size, 3))
              .astype(np.float32) for name, vcfg in cfg.vision}
    return jnp.asarray(ids), {k: jnp.asarray(v) for k, v in pixels.items()}


def test_encode_images_shapes(setup):
    cfg, params = setup
    rng = np.random.default_rng(0)
    _, pixels = _batch(cfg, rng)
    patches = encode_images(params, cfg, pixels)
    assert patches.shape == (2, cfg.num_patches, cfg.llm.dim)


def test_vlm_forward_and_loss(setup):
    cfg, params = setup
    rng = np.random.default_rng(1)
    ids, pixels = _batch(cfg, rng)
    labels = np.asarray(ids).copy()
    labels[:, 0] = IGNORE_INDEX
    logits, loss, _ = vlm_forward(params, cfg, ids, pixels,
                                  labels=jnp.asarray(labels))
    fused_len = ids.shape[1] + cfg.num_patches
    assert logits.shape == (2, fused_len, cfg.llm.vocab_size)
    assert np.isfinite(float(loss))


def test_fusion_layout(setup):
    cfg, params = setup
    rng = np.random.default_rng(2)
    ids, pixels = _batch(cfg, rng, B=1, L=6)
    mask = jnp.ones(ids.shape, jnp.bool_)
    labels = jnp.asarray(np.full(ids.shape, 7, np.int32))
    patch = encode_images(params, cfg, pixels)
    embeds, fmask, flabels, positions = fuse_multimodal(
        patch, jnp.zeros((1, 6, cfg.llm.dim)), mask, labels)
    P = cfg.num_patches
    assert embeds.shape[1] == 6 + P
    # patch labels are IGNORE, text labels preserved
    assert (np.asarray(flabels)[0, 1:1 + P] == IGNORE_INDEX).all()
    assert np.asarray(flabels)[0, 0] == 7
    assert (np.asarray(flabels)[0, 1 + P:] == 7).all()
    # positions are contiguous 0..L+P-1 for a fully-valid row
    np.testing.assert_array_equal(np.asarray(positions)[0],
                                  np.arange(6 + P))


def test_prefill_then_decode_matches_full(setup):
    """The serving split (multimodal prefill into cache, then single-token
    decode) reproduces the one-shot forward logits."""
    cfg, params = setup
    rng = np.random.default_rng(3)
    ids, pixels = _batch(cfg, rng, B=1, L=8)
    full_logits, _, _ = vlm_forward(params, cfg, ids, pixels)

    cache = init_kv_cache(cfg.llm, batch=1, max_len=64, dtype=jnp.float32)
    prefill_logits, _, cache = vlm_forward(params, cfg, ids[:, :-1],
                                           pixels, kv_cache=cache)
    np.testing.assert_allclose(np.asarray(prefill_logits),
                               np.asarray(full_logits[:, :-1]), atol=1e-4)
    # decode the final token
    from emmax_tpu.models.llama import embed_tokens

    last_embed = embed_tokens(params["llm"], ids[:, -1:])
    pos = jnp.full((1, 1), 7 + cfg.num_patches, jnp.int32)
    step_logits, cache = llama_forward(params["llm"], cfg.llm, last_embed,
                                       positions=pos, kv_cache=cache)
    np.testing.assert_allclose(np.asarray(step_logits[:, 0]),
                               np.asarray(full_logits[:, -1]), atol=1e-4)


def test_text_only_forward(setup):
    cfg, params = setup
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(3, cfg.llm.vocab_size, size=(2, 5)))
    logits, _ = text_forward(params, cfg, ids)
    assert logits.shape == (2, 5, cfg.llm.vocab_size)


def test_stop_vision_gradient(setup):
    cfg, params = setup
    rng = np.random.default_rng(5)
    ids, pixels = _batch(cfg, rng, B=1, L=4)
    labels = jnp.asarray(np.asarray(ids).copy())

    def loss_fn(p, stop):
        _, loss, _ = vlm_forward(p, cfg, ids, pixels, labels=labels,
                                 stop_vision_gradient=stop)
        return loss

    g = jax.grad(loss_fn)(params, True)
    vision_grads = jax.tree_util.tree_leaves(g["vision"])
    assert all(float(jnp.abs(v).max()) == 0.0 for v in vision_grads)
    g2 = jax.grad(loss_fn)(params, False)
    assert any(float(jnp.abs(v).max()) > 0 for v in
               jax.tree_util.tree_leaves(g2["vision"]))


def test_cached_tower_features_parity(setup):
    """`pixel_values={"tower_features": ...}` (align-stage vision caching)
    must reproduce the tower path exactly: same fused logits/loss, same
    projector gradients, and must work with params lacking the "vision"
    subtree entirely (the cached deployment drops the towers from device)."""
    from emmax_tpu.models.vit import vit_forward

    cfg, params = setup
    rng = np.random.default_rng(7)
    ids, pixels = _batch(cfg, rng)
    labels = jnp.asarray(np.asarray(ids).copy())

    feats = [vit_forward(params["vision"][name], vcfg, pixels[name])
             for name, vcfg in cfg.vision]
    fused = feats[0] if len(feats) == 1 else jnp.concatenate(feats, axis=-1)

    ref_logits, ref_loss, _ = vlm_forward(params, cfg, ids, pixels,
                                          labels=labels,
                                          stop_vision_gradient=True)
    slim = {k: v for k, v in params.items() if k != "vision"}
    got_logits, got_loss, _ = vlm_forward(
        slim, cfg, ids, {"tower_features": fused}, labels=labels)
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(ref_logits), rtol=0, atol=0)
    assert float(got_loss) == float(ref_loss)

    def loss_fn(p, pv):
        _, loss, _ = vlm_forward(p, cfg, ids, pv, labels=labels,
                                 stop_vision_gradient=True)
        return loss

    g_ref = jax.grad(loss_fn)(params, pixels)["projector"]
    g_got = jax.grad(loss_fn)(slim, {"tower_features": fused})["projector"]
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
