"""Engine sampling modes: greedy determinism, temperature variability,
nucleus cutoff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
from emmax_tpu.serving.engine import (GenerateOptions, ServingEngine,
                                      _select_token)
from emmax_tpu.vla.tokenizer import ByteLevelTokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_vlm_config(1024)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tok = ByteLevelTokenizer(1024)
    rng = np.random.default_rng(0)
    pixels = {n: jnp.asarray(rng.normal(size=(1, v.img_size, v.img_size, 3))
                             .astype(np.float32)) for n, v in cfg.vision}
    return cfg, params, tok, pixels


def test_greedy_is_deterministic(setup):
    cfg, params, tok, pixels = setup
    eng = ServingEngine(cfg, params, tok,
                        options=GenerateOptions(eos_id=tok.eos_id))
    a = eng.generate_ids(["In: x\nOut:"], pixels, max_new_tokens=8)
    b = eng.generate_ids(["In: x\nOut:"], pixels, max_new_tokens=8)
    np.testing.assert_array_equal(a, b)


def test_sampling_varies_across_calls(setup):
    cfg, params, tok, pixels = setup
    eng = ServingEngine(cfg, params, tok,
                        options=GenerateOptions(eos_id=tok.eos_id,
                                                temperature=1.5))
    outs = {tuple(eng.generate_ids(["In: x\nOut:"], pixels,
                                   max_new_tokens=8)[0]) for _ in range(4)}
    assert len(outs) > 1  # different seeds per call → different samples


def test_select_token_nucleus_restricts_support():
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    keys = jax.random.split(jax.random.PRNGKey(0), 200)
    picks = {int(_select_token(logits, k, temperature=1.0, top_p=0.6)[0])
             for k in keys}
    # nucleus {0.5, 0.3} only
    assert picks <= {0, 1}
    picks_greedy = {int(_select_token(logits, k, temperature=0.0, top_p=1.0)[0])
                    for k in keys[:5]}
    assert picks_greedy == {0}
