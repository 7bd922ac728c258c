"""End-to-end training quality: the full pipeline (GCOT data → collate →
sharded train step) overfits a tiny batch — gradients, masking, optimizer
and schedules all have to be right for the loss to collapse."""

import jax
import jax.numpy as jnp
import numpy as np

from emmax_tpu.data.collators import collate_train
from emmax_tpu.data.gcot import (GCOTDataset, SyntheticFrameSource,
                                 make_dummy_gcot_items)
from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
from emmax_tpu.training.train_state import create_train_state, make_optimizer
from emmax_tpu.training.train_step import jit_train_step, make_train_step
from emmax_tpu.vla.action_tokenizer import ActionTokenizer
from emmax_tpu.vla.tokenizer import ByteLevelTokenizer


def test_overfits_fixed_batch():
    tok = ByteLevelTokenizer(1024)
    cfg = tiny_vlm_config(vocab_size=1088)  # covers padded vocab
    ds = GCOTDataset(make_dummy_gcot_items(4), ActionTokenizer(tok), tok,
                     SyntheticFrameSource(28), data_mix="movement_policy",
                     mask_inst=True)
    batch = collate_train([ds[i] for i in range(4)], tok.pad_id,
                          pad_multiple=32)
    from emmax_tpu.ops.image import ImageTransformConfig

    transforms = {n: ImageTransformConfig(size=v.img_size)
                  for n, v in cfg.vision}
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(params, learning_rate=3e-3, weight_decay=0.0,
                           max_grad_norm=1.0, lr_scheduler_type="constant",
                           total_steps=60, stage="vla-full-train")
    state = create_train_state(params, tx)
    step = jit_train_step(make_train_step(cfg, tx, remat=False,
                                          compute_dtype=jnp.float32,
                                          transforms=transforms),
                          donate=False)
    device_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = []
    for _ in range(40):
        state, m = step(state, device_batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    # loss collapses on a fixed batch
    assert losses[-1] < 0.25 * losses[0], (losses[0], losses[-1])
    # action-token accuracy climbs
    assert float(m["action_accuracy"]) > 0.5
