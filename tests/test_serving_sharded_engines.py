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


@pytest.mark.parametrize("mesh_shape", [(1, 1, 8), (1, 4, 2)])
def test_tree_engine_sharded_same_tokens(mesh_shape):
    """Product-tree verification on a TP/FSDP mesh: the tree branch's
    ancestor-mask forward and the accepted-path K/V compaction
    (fori_loop of dynamic_update_slice rows over the SHARDED cache) must
    reproduce the single-device stream token-for-token AND step-for-step
    (teacher forcing makes step counts weight/ulp-independent)."""
    from emmax_tpu.vla.action_tokenizer import ActionTokenizer

    cfg = tiny_vlm_config(vocab_size=2048)
    params = init_vlm_params(jax.random.PRNGKey(1), cfg)
    tok = ByteLevelTokenizer(2048)
    atok = ActionTokenizer(tok)
    rng = np.random.default_rng(5)
    pixels = {name: jnp.asarray(rng.normal(
        size=(1, v.img_size, v.img_size, 3)).astype(np.float32))
        for name, v in cfg.vision}
    patches = {"patches": encode_frame(params, cfg, pixels)}
    ids = tok.encode("MOVEMENT:\nmove left 2 steps;\nPOLICIES: ",
                     add_special_tokens=False)
    a = rng.uniform(-0.5, 0.5, size=7)
    width = 2.0 / (atok.n_bins - 1)
    for _ in range(4):
        ids.extend(int(t) for t in atok.encode_to_ids(a))
        a = np.clip(a + rng.integers(-1, 2, 7) * width, -1, 1)
    stream = np.asarray(ids, np.int32)
    n = len(stream)

    def run(p):
        eng = SpeculativeEngine(cfg, p, tok,
                                options=GenerateOptions(eos_id=tok.eos_id,
                                                        max_new_tokens=n),
                                draft_k=12, action_tree=(5, 3))
        out = eng.generate_ids(PROMPTS, patches, max_new_tokens=n,
                               forced_tokens=stream)
        return np.asarray(out), eng.last_steps

    ref, ref_steps = run(params)
    got, got_steps = run(shard_params(params, make_mesh(mesh_shape)))
    np.testing.assert_array_equal(got, ref)
    assert got_steps == ref_steps
