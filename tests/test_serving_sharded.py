"""Tensor/FSDP-sharded serving: the engine runs on GSPMD-sharded params and
produces the same tokens as single-device execution (the multi-chip serving
path for the 30 Hz v5e-4 target — weight bandwidth scales with the tensor
axis)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
from emmax_tpu.parallel import make_mesh, shard_params
from emmax_tpu.serving.engine import GenerateOptions, ServingEngine
from emmax_tpu.vla.tokenizer import ByteLevelTokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_vlm_config(vocab_size=512)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tok = ByteLevelTokenizer(512)
    rng = np.random.default_rng(0)
    pixels = {name: jnp.asarray(rng.normal(size=(1, v.img_size, v.img_size, 3))
                                .astype(np.float32))
              for name, v in cfg.vision}
    return cfg, params, tok, pixels


def _generate(cfg, params, tok, pixels):
    engine = ServingEngine(cfg, params, tok,
                           options=GenerateOptions(eos_id=tok.eos_id))
    return engine.generate_ids(["In: pick up the cup\nOut:"], pixels,
                               max_new_tokens=8)[0]


def test_single_device_reference(setup):
    cfg, params, tok, pixels = setup
    out = _generate(cfg, params, tok, pixels)
    assert out.shape == (8,)


@pytest.mark.parametrize("mesh_shape", [(1, 1, 8), (1, 4, 2), (1, 8, 1)])
def test_sharded_params_same_tokens(setup, mesh_shape):
    cfg, params, tok, pixels = setup
    ref = _generate(cfg, params, tok, pixels)
    mesh = make_mesh(mesh_shape)
    sharded = shard_params(params, mesh)
    out = _generate(cfg, sharded, tok, pixels)
    np.testing.assert_array_equal(out, ref)
