import numpy as np
import pytest

from emmax_tpu.vla.action_tokenizer import (ActionTokenizer,
                                            decode_ids_to_actions_jnp,
                                            unnormalize_actions,
                                            unnormalize_proprio)
from emmax_tpu.vla.tokenizer import ByteLevelTokenizer


@pytest.fixture(scope="module")
def at():
    return ActionTokenizer(ByteLevelTokenizer())


def test_bin_math_matches_reference_semantics(at):
    """Independent recomputation of action_tokenizer.py:38-47 semantics."""
    rng = np.random.default_rng(0)
    action = rng.uniform(-1.2, 1.2, size=(7,))
    ids = at.encode_to_ids(action)
    clipped = np.clip(action, -1, 1)
    expected = 32000 - np.digitize(clipped, np.linspace(-1, 1, 256))
    np.testing.assert_array_equal(ids, expected)
    assert (ids >= 32000 - 256).all() and (ids < 32000).all()


def test_roundtrip_error_bounded_by_bin_width(at):
    rng = np.random.default_rng(1)
    action = rng.uniform(-1, 1, size=(100, 7))
    ids = at.encode_to_ids(action)
    recon = at.decode_token_ids_to_actions(ids)
    bin_width = 2.0 / 255
    assert np.max(np.abs(recon - action)) <= bin_width


def test_string_pipeline_roundtrip(at):
    """continuous → token string → re-tokenize → continuous is exact at bin
    centers — the property the Solver's policy parsing relies on."""
    rng = np.random.default_rng(2)
    action = rng.uniform(-1, 1, size=(7,))
    text = at(action)
    ids = at.tokenizer.encode(text, add_special_tokens=False)
    recon = at.decode_token_ids_to_actions(np.array(ids))[1:]  # drop boundary
    direct = at.decode_token_ids_to_actions(at.encode_to_ids(action))
    np.testing.assert_allclose(recon, direct)


def test_boundary_clipping(at):
    # id mapping at the extremes: digitize(-1)=1 → vocab-1... digitize(1)=256
    ids = at.encode_to_ids(np.array([-1.0, 1.0]))
    np.testing.assert_array_equal(ids, [32000 - 1, 32000 - 256])
    # decode of the most extreme id clips to last center (ref NOTE in :49-63)
    recon = at.decode_token_ids_to_actions(np.array([32000 - 256]))
    assert recon == pytest.approx(at.bin_centers[-1])


def test_jnp_decode_matches_numpy(at):
    rng = np.random.default_rng(3)
    ids = rng.integers(32000 - 256, 32000, size=(32,))
    np.testing.assert_allclose(
        np.asarray(decode_ids_to_actions_jnp(ids, vocab_size=32000)),
        at.decode_token_ids_to_actions(ids), atol=1e-5)


def test_unnormalize_actions_q99():
    stats = {"q01": [-0.1] * 7, "q99": [0.1] * 7,
             "mask": [True] * 6 + [False]}
    a = np.zeros(7)
    out = unnormalize_actions(a, stats)
    np.testing.assert_allclose(out[:6], 0.0, atol=1e-12)
    assert out[6] == 0.0  # masked dim passes through


def test_unnormalize_proprio_keys():
    stats = {"Q1": [-1.0] * 7, "Q99": [3.0] * 7}
    out = unnormalize_proprio(np.zeros(7), stats)
    np.testing.assert_allclose(out, 1.0)
