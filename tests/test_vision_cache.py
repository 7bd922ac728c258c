"""CachedVisionLoader: cross-epoch tower-feature caching for frozen-tower
stages (reference re-runs the towers every epoch; see
emmax_tpu/training/vision_cache.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from emmax_tpu.data.collators import collate_lm
from emmax_tpu.models.llama import IGNORE_INDEX
from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
from emmax_tpu.ops.image import ImageTransformConfig
from emmax_tpu.training.train_state import (create_train_state,
                                            make_optimizer, trainable_mask)
from emmax_tpu.training.train_step import jit_train_step, make_train_step
from emmax_tpu.training.vision_cache import CachedVisionLoader


class _Loader:
    """Two fixed mixed-modality batches, identical across epochs."""

    def __init__(self, cfg):
        rng = np.random.default_rng(5)
        H = dict(cfg.vision)[cfg.vision[0][0]].img_size
        self.batches = []
        for b in range(2):
            samples = []
            for i in range(2):
                ids = [1] + list(rng.integers(4, 250, size=6 + i))
                lbl = [IGNORE_INDEX] + ids[1:]
                img = (rng.integers(0, 255, (H, H, 3)).astype(np.uint8)
                       if (b + i) % 2 == 0 else None)
                samples.append({"input_ids": ids, "labels": lbl,
                                "image": img})
            self.batches.append(collate_lm(samples, pad_id=0,
                                           pad_multiple=8))

    def epoch(self, epoch=0):
        yield from self.batches

    def __len__(self):
        return len(self.batches)


def test_cached_loader_parity_and_single_encode():
    cfg = tiny_vlm_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    transforms = {n: ImageTransformConfig(size=v.img_size,
                                          resize_strategy="resize-naive")
                  for n, v in cfg.vision}
    tx, _ = make_optimizer(params, learning_rate=1e-3, weight_decay=0.0,
                           max_grad_norm=1.0, lr_scheduler_type="constant",
                           total_steps=10, stage="align")

    def step_fn():
        return jit_train_step(make_train_step(
            cfg, tx, stop_vision_gradient=True, transforms=transforms,
            freeze_mask=trainable_mask(params, "align"),
            compute_dtype=jnp.float32))

    loader = _Loader(cfg)
    cached = CachedVisionLoader(loader, params, cfg, transforms,
                                compute_dtype=jnp.float32)

    # --- parity: same batches, raw-images step vs cached-features step
    # (two states: the jitted step DONATES its input state's buffers)
    ref_step, got_step = step_fn(), step_fn()
    s_ref = create_train_state(params, tx)
    # fresh buffers for the second state: the step donates, and both states
    # would otherwise share the SAME param arrays
    s_got = create_train_state(
        jax.tree_util.tree_map(jnp.array, params), tx)
    losses_ref, losses_got = [], []
    for raw, wrapped in zip(loader.epoch(0), cached.epoch(0)):
        assert "images" not in wrapped
        assert wrapped["pixel_values"]["tower_features"].ndim == 3
        s_ref, m1 = ref_step(s_ref, raw)
        s_got, m2 = got_step(s_got, wrapped)
        losses_ref.append(float(m1["loss"]))
        losses_got.append(float(m2["loss"]))
    np.testing.assert_allclose(losses_got, losses_ref, rtol=2e-5)
    assert cached.encodes == 2          # one tower dispatch per batch

    # --- epoch 2: every row cache-hits; NO further tower dispatches
    for _ in cached.epoch(1):
        pass
    assert cached.encodes == 2

    # --- perturbed image -> content hash miss -> one more dispatch
    loader.batches[0]["images"] = loader.batches[0]["images"].copy()
    loader.batches[0]["images"][0, 0, 0, 0] ^= 1
    for _ in cached.epoch(2):
        pass
    assert cached.encodes == 3
