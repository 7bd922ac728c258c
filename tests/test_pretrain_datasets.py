"""LLaVa-style pretraining datasets (align / finetune stages)."""

import numpy as np
import pytest

from emmax_tpu.data.pretrain import (AlignDataset, FinetuneDataset,
                                     make_synthetic_chat_json)
from emmax_tpu.models.llama import IGNORE_INDEX
from emmax_tpu.vla.tokenizer import ByteLevelTokenizer


@pytest.fixture(scope="module")
def chat_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("llava")
    make_synthetic_chat_json(root / "chat.json", 6, image_dir=root / "img")
    return root / "chat.json", root / "img"


def test_align_dataset_caption_supervision(chat_data):
    ann, imgs = chat_data
    tok = ByteLevelTokenizer()
    ds = AlignDataset(ann, imgs, tok)
    assert len(ds) == 6
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    ids, labels = s["input_ids"], s["labels"]
    assert ids[0] == tok.bos_id and labels[0] == IGNORE_INDEX
    assert ids[-1] == tok.eos_id and labels[-1] == tok.eos_id
    # caption body supervised
    assert sum(1 for l in labels if l != IGNORE_INDEX) == len(labels) - 1
    # text round-trips to the caption
    text = tok.decode([i for i in ids])
    assert "A synthetic object number 0." in text


def test_finetune_dataset_gpt_turn_supervision(chat_data):
    ann, imgs = chat_data
    tok = ByteLevelTokenizer()
    ds = FinetuneDataset(ann, imgs, tok, prompt_style="pure")
    s = ds[1]
    ids, labels = s["input_ids"], s["labels"]
    assert len(ids) == len(labels)
    supervised = [i for i, l in zip(ids, labels) if l != IGNORE_INDEX]
    # supervised region decodes to the gpt answer (+ eos)
    text = tok.decode(supervised)
    assert "A synthetic object number 1." in text
    # human turn is ignored
    prefix_text = tok.decode([i for i, l in zip(ids, labels)
                              if l == IGNORE_INDEX])
    assert "What is in image 1?" in prefix_text


def test_finetune_text_only_examples(chat_data, tmp_path):
    """Examples without an image (language-only co-training) work through
    the LM collator's multimodal_indices path."""
    import json

    from emmax_tpu.data.collators import collate_lm

    ann, imgs = chat_data
    tok = ByteLevelTokenizer()
    examples = json.loads(open(ann).read())
    del examples[0]["image"]   # make one text-only
    p = tmp_path / "mixed.json"
    p.write_text(json.dumps(examples))
    ds = FinetuneDataset(p, imgs, tok)
    batch = collate_lm([ds[0], ds[1]], tok.pad_id,
                       default_image_shape=(64, 64, 3))
    np.testing.assert_array_equal(batch["multimodal_indices"], [1])
