"""Int4 weight-only matmul (Pallas TPU kernel + XLA fallback).

Batch-1 decode on one chip is weight-bandwidth-bound: every token reads the
full LLM weights once, so tokens/sec ≈ HBM_bandwidth / weight_bytes. Int8
(``serving/quant.py``) halves weight bytes vs bf16; this module halves them
again by packing two 4-bit values per int8 byte and dequantizing *inside*
a Pallas kernel feeding the MXU — the unpacked weights never touch HBM.
(``jnp.int4`` itself does not lower through the remote TPU compiler, hence
the hand-packed nibbles.)

This replaces the role of the reference's bitsandbytes 4-bit path
(``/root/reference/vla-scripts/extern/verify_openvla.py:31-60``
``load_in_4bit``) with a TPU-native design.

Layout (per weight ``w: [..., D, F]``):
- values are group-quantized along the input dim: groups of ``group`` rows
  share a per-output-channel scale → ``scale: [..., G, F]`` **bf16** with
  ``G = D / group``. Levels are MID-RISE: stored code ``q ∈ [-8, 7]``
  decodes to ``(q + 0.5)·scale`` — 16 symmetric levels (no wasted −8
  twin), and the scale is MSE-searched over ``SEARCH_FRACS`` of the
  absmax fit rather than absmax/7 (round-4 quality push: −12.5% relative
  matmul-output error on the random-weight worst case at group 64).
  Scales are stored bf16 (round 4): decode is weight-traffic-bound, and
  f32 scale rows were 6.25% (g128) / 12.5% (g64) of the kernel's HBM
  bytes; bf16 halves that. The codes are chosen AGAINST the bf16-rounded
  scale (rounding happens before the level fit, inside the MSE search),
  so the 2^-9 relative scale error — ~50x below the 4-bit code error —
  is the only quality cost. The kernel also accepts f32 scales (it casts
  the scale row per group) — but that is DTYPE compatibility only: the
  decode law is always mid-rise ``(q + 0.5)·scale``. A q4 dict whose
  codes were fitted mid-tread (``q·scale`` — what quantize_vlm_params
  produced before round 4) would decode shifted by ``0.5·scale``. This
  cannot bite an on-disk artifact: q4 dicts are built in-process at load
  time from bf16/HF weights (serving/quant.py) and no repo tool ever
  serializes them — only the quantizer and kernel in the same tree need
  to agree, and they do.
- nibbles are packed *half-split*, not interleaved: byte ``b[p, f]`` holds
  original row ``p`` in its low nibble and row ``p + D/2`` in its high
  nibble → ``q4: [..., D/2, F]`` int8. Unpacking is then **zero shuffles**
  — each nibble plane is a contiguous [D/2, F] tile feeding the MXU.
- ``D % (2 * group) == 0`` so no group straddles the half boundary.
- the HIGH nibble is two's-complement; the LOW nibble is stored BIASED
  (+8, so codes [-8,7] pack as [0,15]). Unpack is then TWO int32 ops per
  byte: ``hi = b >> 4`` (one arithmetic shift sign-extends AND floors away
  the low bits, since ``lo_u ∈ [0,16)``) and ``lo_u = b & 15``; neither
  the −8 bias nor the mid-rise +0.5 ever touches the weight tile — they
  fold into the f32 epilogue as ``−7.5·rowsum(x_lo)`` and
  ``+0.5·rowsum(x_hi)`` per group (BM adds, vs group·BN element fixups).

Round-2 history: sign-extension as int32 shift PAIRS (``(b<<28)>>28`` /
``(b<<24)>>28``) measured fastest of the then-tried Mosaic-legal variants
(int8 shifts do not legalize; an AND + bf16-arithmetic scheme was ~40%
slower end to end). Round 3 replaced it with the biased-low format above:
the decode loop is VPU-unpack-bound, not HBM-bound, so halving the
per-byte op count beats any DMA tweak.

Kernel schedule: grid over (M tiles, F tiles); each program keeps an f32
accumulator and statically unrolls the K-groups, doing per group two
``[BM, group] x [group, BN]`` MXU dots (low plane, high plane). The scale
is constant across K within a group, so it is applied to the [BM, BN]
partial product (BM·BN mults) instead of the weight tile (group·BN mults)
— cheaper whenever BM < group, i.e. always in decode.

Stacked weights: the decode layer loop is a ``lax.fori_loop`` over weights
stacked on a leading layer axis. Slicing the layer *outside* the kernel
(``dynamic_index_in_dim`` → ``pallas_call``) materializes a full per-layer
copy in HBM (~2x traffic, measured 284 vs 502 GB/s); instead the stacked
array is passed whole and the layer index rides a scalar-prefetch argument
used by the BlockSpec index_map, so each grid step DMAs its tile straight
from the stacked array.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_GROUP = 128
# Output-channel tile (lane-dim multiple of 128), by M regime. Measured on
# v5e (round 3, 7-matmul decode layer loop, L32-L16 slope): decode (M<=16)
# bn=512 -> 455 GB/s effective, bn=1024 -> 567 GB/s (+24%; bigger DMA
# bursts per grid step); bn=2048 fails to compile, and bn=1024 also fails
# at prefill shapes (bm=128 x K=11008 unrolled program too large) -> keep
# 512 there. "parallel" dimension_semantics changes nothing; plane-dot and
# fused-qkv variants measured slower.
#
# Round 4 extends the wide-bn decode regime from M<=16 to M<=_M_DECODE_MAX:
# speculative TREE verification runs [B, 44]-row chunks ((7,5) product
# tree, serving/speculative.py) that previously fell onto the bm=128/
# bn=512 prefill tiling — decode is weight-bandwidth-bound, so a 48-row
# chunk costs the same HBM traffic as a 16-row one and the extra MXU rows
# are free. bm tracks the actual M (sublane-rounded), keeping pad rows
# minimal; only the x block grows (48 x 11008 f32 ~= 2 MB VMEM).
_BN_DECODE = 1024
_BN_PREFILL = 512
_M_DECODE_MAX = 48


def _bn_for(M: int, F: int) -> int:
    cap = _BN_DECODE if M <= _M_DECODE_MAX else _BN_PREFILL
    return min(cap, ((F + 127) // 128) * 128)


def _bm_for(M: int) -> int:
    if M <= 16:
        return 16
    if M <= _M_DECODE_MAX:
        return (M + 7) // 8 * 8
    return 128


def _resolve_group(D: int, group: int) -> int:
    assert D % 2 == 0, f"D={D} not even (cannot split nibble planes)"
    while D % (2 * group) != 0:
        group //= 2
    return group


# MSE scale-search candidates, as fractions of the absmax-fit scale.
# absmax clipping is MSE-suboptimal for bell-shaped weights: shrinking the
# scale clips a few outliers but refines the step for ALL interior mass.
# Measured on N(0, 0.02) 4096x4096 (the random-weight worst case of
# scripts/bench_quant_quality.py): g64 relative matmul-output error
# 0.1080 (absmax mid-tread) -> 0.0945 (mid-rise + search), -12.5%.
SEARCH_FRACS = tuple(np.linspace(0.55, 1.0, 10))


def quantize_weight_int4_np(w, group: int = DEFAULT_GROUP,
                            search: bool = True) -> Dict[str, Any]:
    """numpy host-side quantizer: ``[..., D, F]`` → ``{"q4", "scale"}``.

    MID-RISE levels: the stored code ``q ∈ [-8, 7]`` decodes to
    ``(q + 0.5)·scale`` — 16 symmetric levels (no wasted level, step
    absmax/7.5 instead of absmax/7), the MSE-optimal uniform quantizer for
    symmetric weight distributions. All-zero groups get ``scale = 0`` so
    they decode to exact zeros. ``search`` picks the per-(group, channel)
    scale minimizing reconstruction MSE over ``SEARCH_FRACS`` candidates
    instead of the absmax fit (quantize-time cost only; the kernel is
    unchanged by it).

    ``group`` shrinks automatically for tiny test dims; real LLM dims
    (4096 / 11008) keep the default 128.
    """
    import ml_dtypes

    w = np.asarray(w, np.float32)
    D = w.shape[-2]
    group = _resolve_group(D, group)
    G = D // group
    grouped = w.reshape(*w.shape[:-2], G, group, w.shape[-1])
    absmax = np.max(np.abs(grouped), axis=-2, keepdims=True)

    def bf16(s):   # scales ship bf16; fit codes against the ROUNDED value
        return s.astype(ml_dtypes.bfloat16).astype(np.float32)

    base = bf16((absmax / 7.5).astype(np.float32))

    def levels(s):
        safe = np.where(s == 0, 1.0, s)
        return np.clip(np.floor(grouped / safe + 8), 0, 15) - 8

    scale = base
    if search:
        best = None
        for c in SEARCH_FRACS:
            s = bf16(base * np.float32(c))
            err = ((levels(s) + 0.5) * s - grouped) ** 2
            mse = err.sum(-2, keepdims=True)
            if best is None:
                best, scale = mse, s
            else:
                scale = np.where(mse < best, s, scale)
                best = np.minimum(mse, best)
    q = levels(scale).astype(np.int32).reshape(w.shape)
    lo, hi = q[..., : D // 2, :], q[..., D // 2:, :]
    packed = ((hi << 4) | (lo + 8)).astype(np.int8)   # low nibble biased +8
    return {"q4": packed,
            "scale": scale.reshape(*w.shape[:-2], G, w.shape[-1])
                          .astype(ml_dtypes.bfloat16)}


def quantize_weight_int4(w: jax.Array, group: int = DEFAULT_GROUP,
                         search: bool = True) -> Dict[str, Any]:
    """jnp twin of :func:`quantize_weight_int4_np` (jit/eval_shape-able)."""
    w = jnp.asarray(w, jnp.float32)
    D = w.shape[-2]
    group = _resolve_group(D, group)
    G = D // group
    grouped = w.reshape(*w.shape[:-2], G, group, w.shape[-1])
    absmax = jnp.max(jnp.abs(grouped), axis=-2, keepdims=True)

    def bf16(s):   # match quantize_weight_int4_np: fit against bf16 scales
        return s.astype(jnp.bfloat16).astype(jnp.float32)

    base = bf16(absmax / 7.5)

    def levels(s):
        safe = jnp.where(s == 0, 1.0, s)
        return jnp.clip(jnp.floor(grouped / safe + 8), 0, 15) - 8

    scale = base
    if search:
        best = None
        for c in SEARCH_FRACS:
            s = bf16(base * jnp.float32(c))
            mse = (((levels(s) + 0.5) * s - grouped) ** 2).sum(-2,
                                                               keepdims=True)
            if best is None:
                best, scale = mse, s
            else:
                scale = jnp.where(mse < best, s, scale)
                best = jnp.minimum(mse, best)
    q = levels(scale).astype(jnp.int32).reshape(w.shape)
    lo, hi = q[..., : D // 2, :], q[..., D // 2:, :]
    packed = (jnp.left_shift(hi, 4) | (lo + 8)).astype(jnp.int8)
    return {"q4": packed,
            "scale": scale.reshape(*w.shape[:-2], G, w.shape[-1])
                          .astype(jnp.bfloat16)}


def _low_biased(b32):
    """Biased low nibble, UNSIGNED [1, 15] (true level = this − 8)."""
    return b32 & 0xF


def _high_signed(b32):
    """Two's-complement high nibble via ONE arithmetic shift: the byte is
    ``hi·16 + lo_u`` with ``lo_u ∈ [0,16)``, so ``b >> 4 = hi`` exactly."""
    return jax.lax.shift_right_arithmetic(b32, jnp.int32(4))


def unpack_planes(q4: jax.Array):
    """int8 ``[..., D/2, F]`` → (lo levels, hi levels) as f32, signed."""
    b = q4.astype(jnp.int32)
    return ((_low_biased(b) - 8).astype(jnp.float32),
            _high_signed(b).astype(jnp.float32))


def dequantize_weight_int4(qw: Dict[str, Any], dtype=jnp.float32) -> jax.Array:
    """Reference unpack (used by the XLA fallback and tests).

    MID-RISE decode: level ``q`` means ``(q + 0.5)·scale`` (16 symmetric
    half-integer levels; all-zero groups carry scale 0 → exact zeros)."""
    q4 = jnp.asarray(qw["q4"])
    scale = jnp.asarray(qw["scale"])
    G = scale.shape[-2]
    group = (2 * q4.shape[-2]) // G
    lo, hi = unpack_planes(q4)
    w = jnp.concatenate([lo, hi], axis=-2) + 0.5      # [..., D, F]
    srep = jnp.repeat(scale, group, axis=-2)          # [..., D, F]
    return (w * srep).astype(dtype)


def _int4_matmul_xla(x2d, qw):
    q4, scale = qw["q4"], qw["scale"]
    if "layer" in qw:
        q4 = jax.lax.dynamic_index_in_dim(q4, qw["layer"], 0, keepdims=False)
        scale = jax.lax.dynamic_index_in_dim(scale, qw["layer"], 0,
                                             keepdims=False)
    w = dequantize_weight_int4({"q4": q4, "scale": scale}, dtype=x2d.dtype)
    return x2d @ w


# Unpack variant inside the kernel ("shift" | "arith"), env-selectable for
# on-chip A/B (EMMAX_INT4_UNPACK=arith):
# - "shift": hi via one int32 arithmetic shift, lo via int32 AND — two
#   int8→int32→bf16 round trips per byte (round-3 measured 567 GB/s).
# - "arith": no int32 ops at all. lo_u = b & 15 at INT8 width (Mosaic
#   legalizes int8 AND), then hi16 := bf16(b) − bf16(lo_u) = 16·hi EXACTLY
#   (b, lo_u, and their difference are all integers ≤ |127|, below bf16's
#   2^8 exact-integer range), and the ÷16 folds into the hi scale row
#   (one [1, BN] multiply) instead of the [group, BN] tile.
_UNPACK = os.environ.get("EMMAX_INT4_UNPACK", "shift")


def _kernel(x_ref, q4_ref, s_ref, o_ref, *, group: int, g_half: int,
            stacked: bool, unpack: str = None):
    """One [BM, BN] output tile; K fully resident, statically unrolled."""
    unpack = unpack or _UNPACK
    if unpack not in ("shift", "arith"):
        raise ValueError(f"unpack={unpack!r}: expected 'shift' or 'arith' "
                         "(a typo'd EMMAX_INT4_UNPACK would otherwise A/B "
                         "'shift' against itself)")
    x = x_ref[:]                                    # [BM, D]
    d_half = g_half * group
    acc = None
    for g in range(g_half):
        if stacked:
            b8 = q4_ref[0, g * group:(g + 1) * group, :]
            s_lo = s_ref[0, g, :][None, :]          # [1, BN] bf16 (or f32)
            s_hi = s_ref[0, g_half + g, :][None, :]
        else:
            b8 = q4_ref[g * group:(g + 1) * group, :]
            s_lo = s_ref[g, :][None, :]
            s_hi = s_ref[g_half + g, :][None, :]
        s_lo = s_lo.astype(jnp.float32)
        s_hi = s_hi.astype(jnp.float32)
        if unpack == "arith":
            lo = (b8 & 15).astype(jnp.bfloat16)         # [group, BN], +8
            hi = b8.astype(jnp.bfloat16) - lo           # = 16·hi, exact
            s_hi = s_hi * 0.0625
        else:
            b = b8.astype(jnp.int32)
            lo = _low_biased(b).astype(jnp.bfloat16)    # [group, BN], +8
            hi = _high_signed(b).astype(jnp.bfloat16)
        x_lo = x[:, g * group:(g + 1) * group].astype(jnp.bfloat16)
        x_hi = x[:, d_half + g * group:
                 d_half + (g + 1) * group].astype(jnp.bfloat16)
        p_lo = jnp.dot(x_lo, lo, preferred_element_type=jnp.float32)
        p_hi = jnp.dot(x_hi, hi, preferred_element_type=jnp.float32)
        # mid-rise decode: w = (level + 0.5)·s. The low plane's +8 storage
        # bias and the +0.5 merge into ONE −7.5·rowsum fix; the high plane
        # needs +0.5·rowsum (+8 on the arith path, whose dot carries 16·hi
        # and whose scale row carries the 1/16) — all on [BM, 1] instead
        # of [group, BN]
        rs_lo = jnp.sum(x_lo.astype(jnp.float32), axis=1, keepdims=True)
        rs_hi = jnp.sum(x_hi.astype(jnp.float32), axis=1, keepdims=True)
        hi_fix = 8.0 if unpack == "arith" else 0.5
        part = (p_lo - 7.5 * rs_lo) * s_lo + (p_hi + hi_fix * rs_hi) * s_hi
        acc = part if acc is None else acc + part
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "unpack"))
def _int4_matmul_pallas(x2d, q4, scale, *, interpret: bool = False,
                        unpack: str = None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, D = x2d.shape
    D2, F = q4.shape
    G = scale.shape[0]
    group = D // G
    g_half = (D // 2) // group
    bm = _bm_for(M)
    bn = _bn_for(M, F)
    grid = (pl.cdiv(M, bm), pl.cdiv(F, bn))
    kernel = functools.partial(_kernel, group=group, g_half=g_half,
                               stacked=False, unpack=unpack)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D2, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, F), x2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * D * F,
            bytes_accessed=(D2 * F + G * F * scale.dtype.itemsize
                            + M * D * 2 + M * F * 2),
            transcendentals=0),
        # small groups at prefill shapes (bm=128 x K=11008, 86 unrolled
        # groups at g64) exceed Mosaic's default scoped-vmem stack since
        # the round-4 mid-rise epilogue added a rowsum temp per group;
        # physical VMEM is 128 MB — raise the scoped limit
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x2d, q4, scale)


@functools.partial(jax.jit, static_argnames=("interpret", "unpack"))
def _int4_matmul_pallas_stacked(x2d, q4, scale, layer, *,
                                interpret: bool = False,
                                unpack: str = None):
    """Layer selected via scalar-prefetch index_map — no per-layer copy."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, D = x2d.shape
    _, D2, F = q4.shape
    G = scale.shape[1]
    group = D // G
    g_half = (D // 2) // group
    bm = _bm_for(M)
    bn = _bn_for(M, F)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl.cdiv(M, bm), pl.cdiv(F, bn)),
        in_specs=[
            pl.BlockSpec((bm, D), lambda i, j, l: (i, 0)),
            pl.BlockSpec((1, D2, bn), lambda i, j, l: (l[0], 0, j)),
            pl.BlockSpec((1, G, bn), lambda i, j, l: (l[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, l: (i, j)),
    )

    def kernel(l_ref, x_ref, q4_ref, s_ref, o_ref):
        _kernel(x_ref, q4_ref, s_ref, o_ref, group=group, g_half=g_half,
                stacked=True, unpack=unpack)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, F), x2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * D * F,
            bytes_accessed=(D2 * F + G * F * scale.dtype.itemsize
                            + M * D * 2 + M * F * 2),
            transcendentals=0),
        # see the non-stacked call: small groups + long K need more than
        # the default scoped-vmem stack after the mid-rise epilogue
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x2d, q4, scale)


def int4_matmul(x, qw: Dict[str, Any], impl: str = "auto") -> jax.Array:
    """``x [..., D] @ dequant(qw) -> [..., F]``.

    ``qw``: {"q4", "scale"} (single weight) or {"q4", "scale", "layer"}
    with stacked ``[L, ...]`` tensors and a traced layer index.

    impl: "pallas" (TPU), "xla" (anywhere; materializes the dequantized
    weight — correctness/tests only), "interpret" (Pallas interpreter on
    CPU, for kernel-logic parity tests), "auto" (pallas on TPU else xla).
    """
    lead = x.shape[:-1]
    D = x.shape[-1]
    x2d = x.reshape(-1, D)
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        out = _int4_matmul_xla(x2d, qw)
    elif "layer" in qw:
        out = _int4_matmul_pallas_stacked(x2d, qw["q4"], qw["scale"],
                                          qw["layer"],
                                          interpret=(impl == "interpret"))
    else:
        out = _int4_matmul_pallas(x2d, jnp.asarray(qw["q4"]),
                                  jnp.asarray(qw["scale"]),
                                  interpret=(impl == "interpret"))
    return out.reshape(*lead, out.shape[-1])
