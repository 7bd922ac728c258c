"""generate_batch string-probability scoring (True/False VQA path)."""

import jax
import numpy as np
import pytest

from emmax_tpu.models.vla import EmmaXVLA
from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
from emmax_tpu.ops.image import ImageTransformConfig
from emmax_tpu.vla.tokenizer import ByteLevelTokenizer


@pytest.fixture(scope="module")
def vla():
    cfg = tiny_vlm_config(1024)
    return EmmaXVLA(cfg, init_vlm_params(jax.random.PRNGKey(0), cfg),
                    ByteLevelTokenizer(1024),
                    {n: ImageTransformConfig(size=v.img_size)
                     for n, v in cfg.vision})


def test_string_probabilities_normalized(vla):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    probs = vla.generate_batch([img], ["In: is there a cup?\nOut:"],
                               return_string_probabilities=["True", "False"])
    assert len(probs) == 1 and len(probs[0]) == 2
    assert probs[0][0] >= 0 and probs[0][1] >= 0
    assert abs(sum(probs[0]) - 1.0) < 1e-5


def test_generate_batch_text_mode_unchanged(vla):
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
            for _ in range(2)]
    texts = vla.generate_batch(imgs, ["In: a\nOut:", "In: b\nOut:"],
                               max_new_tokens=6)
    assert len(texts) == 2 and all(isinstance(t, str) for t in texts)


def test_vla_factories():
    from emmax_tpu.data.gcot import SyntheticFrameSource, make_dummy_gcot_items
    from emmax_tpu.vla.action_tokenizer import ActionTokenizer
    from emmax_tpu.vla.materialize import get_discrete_dataset_and_collator

    import json
    import tempfile
    from pathlib import Path

    tok = ByteLevelTokenizer()
    tmp = Path(tempfile.mkdtemp())
    (tmp / "second_version.json").write_text(
        json.dumps(make_dummy_gcot_items(4)))
    train_ds, val_ds, tc, vc = get_discrete_dataset_and_collator(
        tmp, "second_version.json", ActionTokenizer(tok), tok,
        SyntheticFrameSource(32))
    assert len(train_ds) == 4 and len(val_ds) == 4
    batch = tc([train_ds[0], train_ds[1]])
    assert batch["input_ids"].shape[0] == 2
    vbatch = vc([val_ds[0]])
    assert isinstance(vbatch["labels"][0], str)
