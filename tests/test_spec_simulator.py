"""Offline draft simulator vs the real engine: step-count parity.

``scripts/sim_spec_drafts.py`` exists so draft policies can be ranked on
CPU in milliseconds instead of multi-minute relay compiles. That only
works if its accept loop IS the engine's (``serving/speculative.py:
_spec_decode``): same n-gram cascade, same full-window history writes,
same stride fallback and product-tree walk. Teacher-forced step counts
are weight-independent, so equality here pins the simulator to the
engine exactly.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from sim_spec_drafts import simulate_steps  # noqa: E402

from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
from emmax_tpu.serving.engine import GenerateOptions
from emmax_tpu.serving.speculative import SpeculativeEngine
from emmax_tpu.vla.action_tokenizer import ActionTokenizer
from emmax_tpu.vla.tokenizer import ByteLevelTokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_vlm_config(vocab_size=2048)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tok = ByteLevelTokenizer(vocab_size=2048)
    return cfg, params, tok


def _pixels(cfg, rng):
    return {name: jnp.asarray(rng.normal(size=(1, v.img_size, v.img_size, 3))
                              .astype(np.float32)) for name, v in cfg.vision}


def _stream(tok, atok, rng, n_actions=6):
    ids = tok.encode("MOVEMENT:\nmove forward 3 steps;\nPOLICIES: ",
                     add_special_tokens=False)
    a = rng.uniform(-0.5, 0.5, size=7)
    width = 2.0 / (atok.n_bins - 1)
    for _ in range(n_actions):
        ids.extend(int(t) for t in atok.encode_to_ids(a))
        a = np.clip(a + rng.integers(-1, 2, 7) * width, -1, 1)
    return np.asarray(ids, np.int32)


@pytest.mark.parametrize("mode", ["lookup", "stride", "tree75", "tree53"])
def test_sim_matches_engine_steps(setup, mode):
    cfg, params, tok = setup
    atok = ActionTokenizer(tok)
    rng = np.random.default_rng(3)
    stream = _stream(tok, atok, rng)
    n = len(stream)
    opts = GenerateOptions(eos_id=tok.eos_id, max_new_tokens=n)
    prompt = ["In: act\nOut:"]

    kw_eng = dict(draft_k=12)
    kw_sim = dict(k=12, max_new=n, vocab_size=tok.vocab_size)
    if mode == "lookup":
        kw_eng["action_drafts"] = False
        kw_sim.update(bin_lo=0, bin_hi=-1)
    else:
        kw_sim.update(stride=True)
        if mode == "tree75":
            kw_eng["action_tree"] = (7, 5)
            kw_sim["tree"] = (7, 5)
        elif mode == "tree53":
            kw_eng["action_tree"] = (5, 3)
            kw_sim["tree"] = (5, 3)

    eng = SpeculativeEngine(cfg, params, tok, options=opts, **kw_eng)
    if mode != "lookup":
        assert eng.action_bins is not None
        kw_sim.update(bin_lo=eng.action_bins[0], bin_hi=eng.action_bins[1])
    out = eng.generate_ids(prompt, _pixels(cfg, rng),
                           max_new_tokens=n, forced_tokens=stream)
    np.testing.assert_array_equal(np.asarray(out[0][:n]), stream)

    # the engine front-aligns the (unpadded) prompt into history
    ids_np, mask_np = eng._prepare_host(prompt, [])
    prompt_ids = ids_np[0][mask_np[0].astype(bool)]
    sim_steps = simulate_steps(stream, prompt_ids.astype(np.int64), **kw_sim)
    assert sim_steps == eng.last_steps, (mode, sim_steps, eng.last_steps)
