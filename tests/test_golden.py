"""Golden-fixture regression tests.

Fixed-seed tiny-model greedy decodes and loss values are pinned to
committed fixtures so future refactors that unintentionally change numerics
(fusion layout, RoPE, masking, loss) fail loudly. Regenerate on purposeful
changes with: ``EMMAX_REGEN_GOLDEN=1 python -m pytest tests/test_golden.py``.
"""

import json
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
from emmax_tpu.serving.engine import GenerateOptions, ServingEngine
from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

FIXTURE = Path(__file__).parent / "fixtures" / "golden_tiny.json"
REGEN = os.environ.get("EMMAX_REGEN_GOLDEN") == "1"


def _compute():
    cfg = tiny_vlm_config(vocab_size=1024)
    params = init_vlm_params(jax.random.PRNGKey(1234), cfg)
    tok = ByteLevelTokenizer(1024)
    rng = np.random.default_rng(99)
    pixels = {n: jnp.asarray(rng.normal(size=(1, v.img_size, v.img_size, 3))
                             .astype(np.float32)) for n, v in cfg.vision}
    engine = ServingEngine(cfg, params, tok,
                           options=GenerateOptions(eos_id=tok.eos_id))
    prompt = "In: golden fixture prompt\nOut:"
    tokens = [int(t) for t in
              engine.generate_ids([prompt], pixels, max_new_tokens=16)[0]]

    # loss on a fixed batch
    from emmax_tpu.data.collators import collate_train
    from emmax_tpu.data.gcot import (GCOTDataset, SyntheticFrameSource,
                                     make_dummy_gcot_items)
    from emmax_tpu.models.vlm import vlm_forward
    from emmax_tpu.ops.image import preprocess_for_towers, ImageTransformConfig
    from emmax_tpu.vla.action_tokenizer import ActionTokenizer

    ds = GCOTDataset(make_dummy_gcot_items(2), ActionTokenizer(tok), tok,
                     SyntheticFrameSource(28), data_mix="movement_policy",
                     mask_inst=True)
    batch = collate_train([ds[0], ds[1]], tok.pad_id, pad_multiple=32)
    transforms = {n: ImageTransformConfig(size=v.img_size)
                  for n, v in cfg.vision}
    pv = preprocess_for_towers(jnp.asarray(batch["images"]), transforms)
    _, loss, _ = vlm_forward(params, cfg, jnp.asarray(batch["input_ids"]), pv,
                             mask=jnp.asarray(batch["attention_mask"]),
                             labels=jnp.asarray(batch["labels"]))
    return {"greedy_tokens": tokens, "loss": round(float(loss), 5)}


def test_golden_tiny_model():
    got = _compute()
    if REGEN or not FIXTURE.exists():
        FIXTURE.parent.mkdir(parents=True, exist_ok=True)
        FIXTURE.write_text(json.dumps(got, indent=2))
        if REGEN:
            pytest.skip("regenerated golden fixture")
    want = json.loads(FIXTURE.read_text())
    assert got["greedy_tokens"] == want["greedy_tokens"]
    # loss tolerant to fp reassociation across jax/XLA versions AND XLA-CPU
    # thread-partitioning (observed 6.2e-3 drift on a loaded machine where
    # the isolated run reproduces the fixture exactly; greedy tokens are
    # the exact gate above)
    assert abs(got["loss"] - want["loss"]) < 2e-2
