"""Real-SentencePiece tokenizer contract tests (switch-flip ready).

All parity in this repo rests on the hermetic ``ByteLevelTokenizer``, which
reproduces the Llama-2 contracts *by construction*. This module verifies the
same contracts against a REAL Llama tokenizer the moment one is available:

    EMMAX_TOKENIZER_MODEL=/path/to/llama-2-tokenizer-dir-or-file \
        python -m pytest tests/test_sentencepiece_contract.py -v

The path may be an HF tokenizer directory (tokenizer.json — loads via the
fast tokenizer, no sentencepiece needed) or a bare SentencePiece
``tokenizer.model`` (requires the ``sentencepiece`` package). Until then the
module self-skips.

Contracts encoded (SURVEY §7 "hard parts"):
- vocab_size 32000; <PAD> added then padded to 32064 rows
  (``/root/reference/prismatic/models/backbones/llm/llama2.py:73-76``).
- BOS-prefix tokenization: exactly one leading ``<s>``
  (``base_llm.py:164-180``).
- Token 29871 is the "empty" ``▁`` piece appended before action decoding
  (``/root/reference/prismatic/models/vlas/openvla.py:60-65``,
  ``extern/hf/modeling_prismatic.py:506-516``).
- The last 256 vocab entries serve as action bins with begin idx
  ``vocab_size - (n_bins + 1)`` (``action_tokenizer.py:34-36``).
- Solver decode→re-encode round trip: action strings detokenize to the same
  ids the ActionTokenizer produced (``solver.py:108-137`` re-tokenizes the
  *decoded text*).
"""

import os
from pathlib import Path

import numpy as np
import pytest

TOK_PATH = os.environ.get("EMMAX_TOKENIZER_MODEL")

pytestmark = pytest.mark.skipif(
    not TOK_PATH,
    reason="set EMMAX_TOKENIZER_MODEL=/path/to/llama tokenizer to run the "
           "real-SentencePiece contract suite")


@pytest.fixture(scope="module")
def tok():
    """HFTokenizerAdapter over the real tokenizer."""
    from emmax_tpu.vla.tokenizer import HFTokenizerAdapter

    path = Path(TOK_PATH)
    if path.is_file() and path.suffix == ".model":
        sp = pytest.importorskip(
            "sentencepiece",
            reason="bare .model file needs the sentencepiece package; "
                   "point EMMAX_TOKENIZER_MODEL at an HF dir instead")
        from transformers import LlamaTokenizer

        hf = LlamaTokenizer(vocab_file=str(path), legacy=False)
    else:
        from transformers import AutoTokenizer

        hf = AutoTokenizer.from_pretrained(str(path), padding_side="right")
    return HFTokenizerAdapter(hf)


def test_vocab_and_pad_contract(tok):
    assert tok.vocab_size == 32000
    assert tok.padded_vocab_size == 32064  # pad_to_multiple_of=64
    assert tok.bos_id == 1 and tok.eos_id == 2


def test_bos_prefix_contract(tok):
    ids = tok.encode("What action should the robot take?")
    assert ids[0] == tok.bos_id
    assert tok.bos_id not in ids[1:]
    bare = tok.encode("hello", add_special_tokens=False)
    assert tok.bos_id not in bare


def test_empty_token_29871(tok):
    # "Out: " (trailing space) must end in the ▁ piece the reference appends
    # before generating action tokens (openvla.py:60-65)
    ids = tok.encode("Out: ")
    assert ids[-1] == 29871
    assert tok.empty_token_id == 29871


def test_action_token_begin_idx(tok):
    from emmax_tpu.vla.action_tokenizer import ActionTokenizer

    at = ActionTokenizer(tok)
    assert at.action_token_begin_idx == 32000 - 257  # 31743


def test_action_region_decode_encode_round_trip(tok):
    """Every one of the 255 producible action ids must survive
    decode→encode (the Solver re-tokenizes decoded text, solver.py:108-137;
    several of these pieces are multi-byte)."""
    from emmax_tpu.vla.action_tokenizer import ActionTokenizer

    at = ActionTokenizer(tok)
    rng = np.random.default_rng(0)
    for _ in range(64):
        action = rng.uniform(-1, 1, size=7)
        ids = at.encode_to_ids(action)
        text = tok.decode(list(ids))
        re_ids = tok.encode(text, add_special_tokens=False)
        # a leading ▁ may appear when re-encoding a bare fragment
        re_ids = [i for i in re_ids if i != 29871]
        assert re_ids == list(ids), (action, text)


def test_solver_policy_round_trip(tok):
    """Full grammar round trip: ActionTokenizer string → POLICIES: text →
    Solver.extract_action_policies → bin centers identical to direct
    decode."""
    from emmax_tpu.vla.action_tokenizer import ActionTokenizer
    from emmax_tpu.vla.solver import Solver

    at = ActionTokenizer(tok)
    solver = Solver(at)
    rng = np.random.default_rng(1)
    actions = rng.uniform(-1, 1, size=(3, 7))
    policy_strs = [at(a) for a in actions]
    text = "MOVEMENT: move forward 5 steps;\nPOLICIES: " \
        + ";".join(policy_strs) + ";"
    parsed, _remain = solver.extract_action_policies(text)
    want = np.stack([at.decode_token_ids_to_actions(at.encode_to_ids(a))
                     for a in actions])
    assert parsed and len(parsed) == 3
    np.testing.assert_allclose(np.asarray(parsed), want, atol=1e-9)
