"""Validation dump + HF facade surface."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emmax_tpu.models.vla import EmmaXVLA
from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
from emmax_tpu.ops.image import ImageTransformConfig
from emmax_tpu.vla.tokenizer import ByteLevelTokenizer


def test_run_validation_dumps_json(tmp_path):
    from emmax_tpu.data.collators import BatchLoader, collate_train
    from emmax_tpu.data.gcot import (GCOTDataset, SyntheticFrameSource,
                                     make_dummy_gcot_items)
    from emmax_tpu.training.loop import make_eval_fn, run_validation
    from emmax_tpu.vla.action_tokenizer import ActionTokenizer
    from emmax_tpu.vla.solver import Solver

    tok = ByteLevelTokenizer(2048)
    at = ActionTokenizer(tok)
    cfg = tiny_vlm_config(2112)  # >= tokenizer padded vocab
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    transforms = {n: ImageTransformConfig(size=v.img_size)
                  for n, v in cfg.vision}
    ds = GCOTDataset(make_dummy_gcot_items(4), at, tok,
                     SyntheticFrameSource(32), data_mix="movement_policy",
                     mask_inst=True)
    loader = BatchLoader(ds, 2, lambda s: collate_train(s, tok.pad_id,
                                                        pad_multiple=32),
                         shuffle=False)
    eval_fn = make_eval_fn(cfg, transforms=transforms,
                           compute_dtype=jnp.float32)
    summary = run_validation(vlm_cfg=cfg, params=params, eval_fn=eval_fn,
                             loader=loader, tokenizer=tok,
                             solver=Solver(at), run_dir=tmp_path, epoch=3)
    assert summary["n"] == 4
    blob = json.loads(
        (tmp_path / "validation_results" / "epoch_3_0.json").read_text())
    assert blob["summary"]["epoch"] == 3
    assert len(blob["records"]) == 4
    assert "POLICIES" in blob["records"][0]["ground_truth"]


def test_hf_facade_surface():
    from emmax_tpu.extern.hf_facade import EmmaXForVision2Seq, EmmaXProcessor

    cfg = tiny_vlm_config(1024)
    vla = EmmaXVLA(cfg, init_vlm_params(jax.random.PRNGKey(0), cfg),
                   ByteLevelTokenizer(1024),
                   {n: ImageTransformConfig(size=v.img_size)
                    for n, v in cfg.vision})
    processor = EmmaXProcessor(vla)
    model = EmmaXForVision2Seq(vla)
    rng = np.random.default_rng(0)
    image = rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)

    prompt, image = processor.get_prompt("put carrot in pot", image)
    assert "CURRENT GRIPPER: [64, 64]" in prompt  # image-center default
    inputs = processor(prompt, image)
    actions, reasoning = model.generate_actions(
        inputs, processor.tokenizer, do_sample=False, max_new_tokens=10)
    assert actions[0].shape == (7,)
    assert isinstance(reasoning, str)
    with pytest.raises(AssertionError):
        model.generate_actions(inputs, do_sample=True)
