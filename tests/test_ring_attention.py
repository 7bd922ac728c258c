"""Ring attention (context parallelism) vs the single-device reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emmax_tpu.ops.attention import xla_attention
from emmax_tpu.ops.ring_attention import ring_attention
from emmax_tpu.parallel import make_mesh


def _qkv(rng, B=2, L=64, H=2, D=16):
    return tuple(jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
                 for _ in range(3))


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_reference(causal):
    rng = np.random.default_rng(0)
    q, k, v = _qkv(rng)
    mesh = make_mesh((1, 8, 1))
    ref = xla_attention(q, k, v, causal=causal)
    out = ring_attention(q, k, v, mesh=mesh, axis_name="fsdp", causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_with_padding_mask():
    rng = np.random.default_rng(1)
    q, k, v = _qkv(rng, B=2, L=64)
    kv_mask = np.ones((2, 64), bool)
    kv_mask[0, :16] = False
    kv_mask[1, 50:] = False
    kv_mask = jnp.asarray(kv_mask)
    mesh = make_mesh((1, 8, 1))
    ref = xla_attention(q, k, v, kv_mask=kv_mask, causal=True)
    out = ring_attention(q, k, v, mesh=mesh, axis_name="fsdp",
                         kv_mask=kv_mask, causal=True)
    m = np.asarray(kv_mask)
    np.testing.assert_allclose(np.asarray(out)[m], np.asarray(ref)[m],
                               atol=2e-5)


def test_ring_on_tensor_axis():
    """Context axis can be any mesh axis (2-way here, with fsdp=4 unused)."""
    rng = np.random.default_rng(2)
    q, k, v = _qkv(rng, L=32)
    mesh = make_mesh((1, 4, 2))
    ref = xla_attention(q, k, v, causal=True)
    out = ring_attention(q, k, v, mesh=mesh, axis_name="tensor", causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
