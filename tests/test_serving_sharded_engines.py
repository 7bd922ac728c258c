"""TP/FSDP-sharded SERVING ENGINES beyond the dense one: the speculative
engine (the closed-loop 37.7 Hz path — TP4 extrapolations in
docs/BENCHMARKS.md ride on it) and the paged continuous-batching engine
must produce token streams identical to their own single-device runs when
the params are GSPMD-sharded over a mesh.

Patches are pre-encoded ONCE and shared between the sharded and unsharded
runs (`{"patches": ...}` — the cross-jit ulp rule, CLAUDE.md): the ViT is
not what tensor parallelism multiplies, the decode weight reads are.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
from emmax_tpu.parallel import make_mesh, shard_params
from emmax_tpu.serving.engine import (GenerateOptions, ServingEngine,
                                      encode_frame)
from emmax_tpu.serving.paged import PagedServingEngine
from emmax_tpu.serving.speculative import SpeculativeEngine
from emmax_tpu.vla.tokenizer import ByteLevelTokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_vlm_config(vocab_size=512)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tok = ByteLevelTokenizer(512)
    rng = np.random.default_rng(0)
    pixels = {name: jnp.asarray(rng.normal(size=(1, v.img_size, v.img_size,
                                                 3)).astype(np.float32))
              for name, v in cfg.vision}
    patches = {"patches": encode_frame(params, cfg, pixels)}
    return cfg, params, tok, patches


PROMPTS = ["In: pick up the cup\nOut:"]


def _spec_tokens(cfg, params, tok, patches):
    eng = SpeculativeEngine(cfg, params, tok,
                            options=GenerateOptions(eos_id=tok.eos_id),
                            draft_k=4)
    out = eng.generate_ids(PROMPTS, patches, max_new_tokens=12)
    return out, eng.last_steps


@pytest.mark.parametrize("mesh_shape", [(1, 1, 8), (1, 4, 2)])
def test_speculative_sharded_same_tokens(setup, mesh_shape):
    cfg, params, tok, patches = setup
    ref, _ = _spec_tokens(cfg, params, tok, patches)
    sharded = shard_params(params, make_mesh(mesh_shape))
    out, steps = _spec_tokens(cfg, sharded, tok, patches)
    np.testing.assert_array_equal(out, ref)
    assert steps is not None  # the speculative path ran (no fence fallback)


def _paged_tokens(cfg, params, tok, patches):
    eng = PagedServingEngine(cfg, params, tok, num_slots=3, n_pages=24,
                             page_size=64, max_pages_per_slot=4, burst=8)
    for i in range(3):
        eng.submit(PROMPTS[0] + " " * i, patches, max_new_tokens=10)
    return eng.run_until_complete()


@pytest.mark.parametrize("mesh_shape", [(1, 1, 8)])
def test_paged_sharded_same_tokens(setup, mesh_shape):
    cfg, params, tok, patches = setup
    ref = _paged_tokens(cfg, params, tok, patches)
    sharded = shard_params(params, make_mesh(mesh_shape))
    got = _paged_tokens(cfg, sharded, tok, patches)
    assert ref.keys() == got.keys()
    for rid in ref:
        np.testing.assert_array_equal(got[rid], ref[rid])
