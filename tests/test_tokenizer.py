import numpy as np
import pytest

from emmax_tpu.vla.tokenizer import ByteLevelTokenizer, pad_to_multiple


@pytest.fixture(scope="module")
def tok():
    return ByteLevelTokenizer()


def test_vocab_layout(tok):
    assert tok.vocab_size == 32000
    assert tok.padded_vocab_size == 32064  # llama2.py:73-76 pad_to_multiple_of=64
    assert tok.pad_id == 32000
    assert tok.bos_id == 1 and tok.eos_id == 2


def test_bos_contract(tok):
    """encode(add_special_tokens=True) prepends exactly one BOS
    (base_llm.py:164-180 contract)."""
    ids = tok.encode("hello")
    assert ids[0] == tok.bos_id
    assert tok.bos_id not in ids[1:]
    ids2 = tok.encode("hello", add_special_tokens=False)
    assert ids2[0] != tok.bos_id
    assert ids[1:] == ids2


def test_word_boundary_prefix(tok):
    """add_special_tokens=False emits a leading word-boundary piece that the
    Solver drops (solver.py:125-127)."""
    ids = tok.encode("xyz", add_special_tokens=False)
    assert ids[0] == tok.empty_token_id


def test_text_roundtrip(tok):
    for text in ["hello world", "Put the pot next to the cans.",
                 "NEXT GRIPPER: [105, 74]\nMOVEMENT:\nmove forward 3 steps;"]:
        ids = tok.encode(text)
        assert tok.decode(ids) == text


def test_action_region_roundtrip(tok):
    """The last 256 base-vocab tokens must round-trip decode→encode exactly
    (action_tokenizer.py contract)."""
    for tid in [tok.vocab_size - 1, tok.vocab_size - 128, tok.vocab_size - 256]:
        text = tok.decode([tid])
        re_ids = tok.encode(text, add_special_tokens=False)
        assert re_ids[1:] == [tid]  # [word-boundary, tid]


def test_mixed_action_and_text_roundtrip(tok):
    ids = [tok.vocab_size - k for k in (1, 50, 200, 256)]
    blob = "POLICIES:\n" + tok.decode(ids) + ";" + tok.decode(ids)
    re_ids = tok.encode(blob, add_special_tokens=False)
    # all four action ids appear, twice
    for tid in ids:
        assert re_ids.count(tid) == 2


def test_pad_to_multiple():
    assert pad_to_multiple(32001, 64) == 32064
    assert pad_to_multiple(32064, 64) == 32064
