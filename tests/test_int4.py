"""Int4 nibble-packed weight quantization: pack/unpack exactness, matmul
parity (XLA fallback vs Pallas interpreter), and end-to-end decode on
int4-quantized params."""

import jax
import jax.numpy as jnp
import numpy as np

from emmax_tpu.models.llama import (LlamaConfig, embed_tokens,
                                    init_llama_params, llama_forward,
                                    init_kv_cache)
from emmax_tpu.ops.int4_matmul import (dequantize_weight_int4, int4_matmul,
                                       quantize_weight_int4_np)
from emmax_tpu.serving.quant import quantize_vlm_params_np

CFG = LlamaConfig(vocab_size=256, dim=64, n_layers=2, n_heads=4, n_kv_heads=4,
                  hidden_dim=128, max_seq_len=64)


def test_pack_unpack_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = rng.normal(scale=0.02, size=(256, 128)).astype(np.float32)
    # search=False: the absmax-fit scale never clips, so scale/2 is exact
    qw = quantize_weight_int4_np(w, group=128, search=False)
    assert qw["q4"].shape == (128, 128) and qw["q4"].dtype == np.int8
    assert qw["scale"].shape == (2, 128)
    back = np.asarray(dequantize_weight_int4(qw))
    # mid-rise levels (q + 0.5)·s, step s: max error is scale/2 per group
    srep = np.repeat(np.asarray(qw["scale"]), 128, axis=0)
    assert (np.abs(back - w) <= srep / 2 + 1e-7).all()


def test_scale_search_reduces_mse():
    """The MSE scale search must never lose to the absmax fit (it includes
    frac=1.0 as a candidate) and must WIN on bell-shaped weights."""
    rng = np.random.default_rng(9)
    w = rng.normal(scale=0.02, size=(512, 128)).astype(np.float32)

    def mse(search):
        back = np.asarray(dequantize_weight_int4(
            quantize_weight_int4_np(w, group=64, search=search)))
        return float(((back - w) ** 2).sum())

    assert mse(True) < 0.95 * mse(False)


def test_pack_handles_stacked_layers_and_negative_nibbles():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(3, 64, 32)).astype(np.float32)
    qw = quantize_weight_int4_np(w)
    assert qw["q4"].shape == (3, 32, 32)
    back = np.asarray(dequantize_weight_int4(qw))
    assert back.shape == w.shape
    # every mid-rise level (q + 0.5)·s for q in -8..7 must round-trip
    # through the nibble pack exactly
    g = 8
    levels = np.tile((np.arange(-8, 8, dtype=np.float32) + 0.5)[:, None],
                     (1, 8))
    ql = quantize_weight_int4_np(levels, group=g, search=False)
    bl = np.asarray(dequantize_weight_int4(ql))
    np.testing.assert_allclose(bl, levels, atol=1e-6)


def test_all_zero_group_dequantizes_to_exact_zero():
    """Padded/zero weight regions must stay exactly zero: mid-rise has no
    zero level, so all-zero groups carry scale 0 (not the old 1.0 guard,
    which would decode them to ±0.5)."""
    w = np.zeros((64, 16), np.float32)
    w[32:, :] = np.linspace(-1, 1, 16)[None, :]      # one live half
    qw = quantize_weight_int4_np(w, group=32)
    back = np.asarray(dequantize_weight_int4(qw))
    assert (back[:32] == 0).all()
    assert np.abs(back[32:] - w[32:]).max() < 0.2


def test_matmul_xla_matches_dequant_dense():
    rng = np.random.default_rng(2)
    w = rng.normal(scale=0.02, size=(256, 128)).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
    qw = {k: jnp.asarray(v) for k, v in quantize_weight_int4_np(w).items()}
    ref = x @ dequantize_weight_int4(qw)
    out = int4_matmul(x, qw, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_pallas_interpret_matches_xla():
    rng = np.random.default_rng(3)
    w = rng.normal(scale=0.02, size=(512, 384)).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(4, 512)).astype(np.float32))
    qw = {k: jnp.asarray(v) for k, v in quantize_weight_int4_np(w).items()}
    ref = int4_matmul(x, qw, impl="xla")
    out = int4_matmul(x, qw, impl="interpret")
    # kernel dots in bf16 (serving dtype); fallback dequantizes to f32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-2,
                               atol=2e-2)
    # leading dims flattened/restored
    x3 = x.reshape(2, 2, 512)
    out3 = int4_matmul(x3, qw, impl="interpret")
    assert out3.shape == (2, 2, 384)


def test_unpack_variants_bitwise_equal():
    """The "arith" unpack (int8 AND + bf16 subtract, no int32 round trips;
    the 1/16 folded into the hi scale row) must feed the MXU the exact
    same bf16 values as the int32-shift unpack — outputs agree BITWISE,
    so the on-chip A/B is purely a speed decision."""
    from emmax_tpu.ops.int4_matmul import (_int4_matmul_pallas,
                                           _int4_matmul_pallas_stacked)
    rng = np.random.default_rng(7)
    w = rng.normal(scale=0.02, size=(3, 512, 384)).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(4, 512)).astype(np.float32))
    qs = {k: jnp.asarray(v) for k, v in quantize_weight_int4_np(w).items()}
    for layer in range(3):
        a = _int4_matmul_pallas_stacked(x, qs["q4"], qs["scale"], layer,
                                        interpret=True, unpack="shift")
        b = _int4_matmul_pallas_stacked(x, qs["q4"], qs["scale"], layer,
                                        interpret=True, unpack="arith")
        assert jnp.array_equal(a, b), layer
    qw = {"q4": qs["q4"][0], "scale": qs["scale"][0]}
    a = _int4_matmul_pallas(x, qw["q4"], qw["scale"], interpret=True,
                            unpack="shift")
    b = _int4_matmul_pallas(x, qw["q4"], qw["scale"], interpret=True,
                            unpack="arith")
    assert jnp.array_equal(a, b)


def test_unpack_unknown_value_raises():
    """A typo'd EMMAX_INT4_UNPACK must fail loudly, not silently A/B
    'shift' against itself."""
    import pytest

    from emmax_tpu.ops.int4_matmul import _int4_matmul_pallas
    rng = np.random.default_rng(8)
    w = rng.normal(scale=0.02, size=(512, 384)).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(4, 512)).astype(np.float32))
    qw = {k: jnp.asarray(v) for k, v in quantize_weight_int4_np(w).items()}
    with pytest.raises(ValueError, match="unpack"):
        _int4_matmul_pallas(x, qw["q4"], qw["scale"], interpret=True,
                            unpack="airth")


def test_int4_llama_decode_close_to_fp():
    params = init_llama_params(jax.random.PRNGKey(0), CFG)
    vlm_like = {"llm": params}
    qtree = quantize_vlm_params_np(
        jax.tree_util.tree_map(np.asarray, vlm_like), bits=4)
    qparams = jax.tree_util.tree_map(jnp.asarray, qtree)["llm"]
    assert qparams["layers"]["wq"]["q4"].dtype == jnp.int8

    rng = np.random.default_rng(4)
    ids = rng.integers(0, 256, size=(1, 16))
    embeds = embed_tokens(params, jnp.asarray(ids))
    ref, _ = llama_forward(params, CFG, embeds)
    out, _ = llama_forward(qparams, CFG, embeds)
    rel = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert rel < 0.3  # tiny random weights; real dims use group=128
    # margin-gated greedy stability: wherever the fp top-2 margin exceeds
    # twice the observed perturbation, the argmax MUST be preserved
    # (random tiny weights have near-tie logits, so ungated agreement is
    # noise — same gating as tests/test_greedy_parity.py)
    pert = jnp.max(jnp.abs(out - ref), axis=-1)
    top2 = jnp.sort(ref, axis=-1)[..., -2:]
    margin = top2[..., 1] - top2[..., 0]
    gated = margin > 2 * pert
    match = jnp.argmax(out, -1) == jnp.argmax(ref, -1)
    assert bool(jnp.all(jnp.where(gated, match, True)))

    # cached decode traces + runs on the int4 tree
    cache = init_kv_cache(CFG, 1, 32, dtype=jnp.float32)
    _, cache = llama_forward(qparams, CFG, embeds, kv_cache=cache)
    step, _ = llama_forward(qparams, CFG, embeds[:, -1:], kv_cache=cache)
    assert step.shape == (1, 1, 256)


def test_stacked_layer_matmul_paths_agree():
    """Stacked {"q4","scale","layer"} (decode fori_loop form): XLA fallback
    and the scalar-prefetch Pallas kernel (interpret) match per-layer."""
    rng = np.random.default_rng(5)
    W = rng.normal(scale=0.02, size=(3, 256, 128)).astype(np.float32)
    qw = {k: jnp.asarray(v) for k, v in quantize_weight_int4_np(W).items()}
    x = jnp.asarray(rng.normal(size=(2, 256)).astype(np.float32))
    for layer in range(3):
        ref = x @ dequantize_weight_int4(
            {"q4": qw["q4"][layer], "scale": qw["scale"][layer]})
        stacked = {**qw, "layer": jnp.int32(layer)}
        out_xla = int4_matmul(x, stacked, impl="xla")
        np.testing.assert_allclose(np.asarray(out_xla), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        out_pl = int4_matmul(x, stacked, impl="interpret")
        np.testing.assert_allclose(np.asarray(out_pl), np.asarray(ref),
                                   rtol=3e-2, atol=2e-2)


def test_tree_chunk_rows_use_wide_tile_and_match_xla():
    """M in (16, 48] — the speculative TREE-verify chunk shape ([B, 44]
    rows for action_tree=(7,5)) — stays on the wide-bn decode tiling
    (round 4: bm tracks M, bn=1024) and must match the XLA fallback."""
    from emmax_tpu.ops.int4_matmul import _bm_for, _bn_for

    assert _bm_for(44) == 48 and _bn_for(44, 4096) == 1024
    assert _bm_for(16) == 16 and _bm_for(49) == 128
    assert _bn_for(49, 4096) == 512

    rng = np.random.default_rng(11)
    w = rng.normal(scale=0.02, size=(512, 384)).astype(np.float32)
    qw = {k: jnp.asarray(v) for k, v in quantize_weight_int4_np(w).items()}
    for M in (17, 44, 48):
        x = jnp.asarray(rng.normal(size=(M, 512)).astype(np.float32))
        ref = int4_matmul(x, qw, impl="xla")
        out = int4_matmul(x, qw, impl="interpret")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-2, atol=2e-2)


def test_scales_are_bf16_and_legacy_f32_accepted():
    """Round 4: quantizers emit bf16 scales (halved scale-row traffic);
    the kernel must accept BOTH bf16 and legacy f32 scale dicts and
    produce identical outputs (codes were fit against the bf16-rounded
    scale, so the f32 upcast is exact)."""
    rng = np.random.default_rng(12)
    w = rng.normal(scale=0.02, size=(256, 128)).astype(np.float32)
    qw = quantize_weight_int4_np(w, group=64)
    assert str(qw["scale"].dtype) == "bfloat16"
    x = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
    out_bf16 = int4_matmul(
        x, {k: jnp.asarray(v) for k, v in qw.items()}, impl="interpret")
    legacy = {"q4": jnp.asarray(qw["q4"]),
              "scale": jnp.asarray(qw["scale"], jnp.float32)}
    out_f32 = int4_matmul(x, legacy, impl="interpret")
    assert jnp.array_equal(out_bf16, out_f32)
