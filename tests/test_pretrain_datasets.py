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


def test_split_modality_run_training_mixed_epoch(tmp_path):
    """End-to-end VLM-stage loop: a mixed text+image synthetic dataset runs
    one epoch through SplitModalityLoader + collate_lm + run_training, with
    both modalities exercised (reference base_strategy.py:157-292)."""
    import jax
    import jax.numpy as jnp

    from emmax_tpu.data.collators import SplitModalityLoader, collate_lm
    from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
    from emmax_tpu.ops.image import ImageTransformConfig
    from emmax_tpu.training.loop import LoopConfig, run_training
    from emmax_tpu.training.metrics import Metrics
    from emmax_tpu.training.train_state import (create_train_state,
                                                make_optimizer)
    from emmax_tpu.training.train_step import jit_train_step, make_train_step

    tok = ByteLevelTokenizer(1024)
    make_synthetic_chat_json(tmp_path / "chat.json", 8,
                             image_dir=tmp_path / "img", text_only_every=2)
    ds = FinetuneDataset(tmp_path / "chat.json", tmp_path / "img", tok,
                         prompt_style="pure")
    mods = ds.modality_lengths()
    assert sum(1 for m, _ in mods if not m) == 4  # half text-only
    loader = SplitModalityLoader(ds, 2, lambda s: collate_lm(s, tok.pad_id))
    batches = list(loader.epoch(0))
    assert len(batches) == 4
    # modality-pure buckets: each batch is all-mm or all-text
    purity = [bool(np.all(b["multimodal_mask"]))
              or bool(np.all(~b["multimodal_mask"])) for b in batches]
    assert all(purity)
    seen_mm = sum(int(b["multimodal_mask"].sum()) for b in batches)
    assert seen_mm == 4

    cfg = tiny_vlm_config(vocab_size=tok.padded_vocab_size)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(params, learning_rate=1e-3, weight_decay=0.0,
                           max_grad_norm=1.0, lr_scheduler_type="constant",
                           total_steps=4, stage="vla-full-train")
    state = create_train_state(params, tx)
    transforms = {n: ImageTransformConfig(size=v.img_size)
                  for n, v in cfg.vision}
    step = jit_train_step(make_train_step(cfg, tx, remat=False,
                                          compute_dtype=jnp.float32,
                                          transforms=transforms))
    out = run_training(vlm_cfg=cfg, state=state, train_step=step,
                       loader=loader, metrics=Metrics([]),
                       loop_cfg=LoopConfig(epochs=1, log_every=2))
    assert int(out.step) == 4


def test_text_only_rows_do_not_attend_patches():
    """A text-only row's loss must equal the pure-text forward (the zero
    patch block is masked out entirely)."""
    import jax
    import jax.numpy as jnp

    from emmax_tpu.models.vlm import (init_vlm_params, text_forward,
                                      tiny_vlm_config, vlm_forward)

    cfg = tiny_vlm_config(vocab_size=1024)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 500, size=(1, 10))
    ids[:, 0] = 1
    labels = ids.copy()
    labels[:, :2] = IGNORE_INDEX
    pixels = {n: jnp.asarray(rng.normal(size=(1, v.img_size, v.img_size, 3))
                             .astype(np.float32)) for n, v in cfg.vision}
    _, loss_mixed, _ = vlm_forward(
        params, cfg, jnp.asarray(ids), pixels,
        labels=jnp.asarray(labels),
        multimodal_mask=jnp.zeros((1,), bool))
    _, loss_text = text_forward(params, cfg, jnp.asarray(ids),
                                labels=jnp.asarray(labels))
    np.testing.assert_allclose(float(loss_mixed), float(loss_text),
                               rtol=1e-5)
