import jax.numpy as jnp
import numpy as np
import pytest

from emmax_tpu.ops.image import (ImageTransformConfig, apply_transform,
                                 dinosiglip_transform_configs,
                                 preprocess_for_towers,
                                 transform_configs_for_backbone)


def _img(rng, h=256, w=256):
    return jnp.asarray(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))


def test_resize_naive_shape_and_norm():
    rng = np.random.default_rng(0)
    img = _img(rng)
    out = apply_transform(img, ImageTransformConfig())
    assert out.shape == (224, 224, 3)
    # imagenet-normalized pixels (+ bicubic overshoot) stay bounded
    assert float(out.min()) > -4 and float(out.max()) < 4


def test_dinosiglip_dual_normalization():
    rng = np.random.default_rng(1)
    img = _img(rng)
    outs = preprocess_for_towers(img, dinosiglip_transform_configs())
    assert set(outs) == {"dino", "siglip"}
    # siglip normalization is (x-0.5)/0.5 -> [-1, 1] + bicubic overshoot
    assert float(jnp.abs(outs["siglip"]).max()) <= 1.4
    # same source image, different normalization => different tensors
    assert not np.allclose(np.asarray(outs["dino"]), np.asarray(outs["siglip"]))


def test_resize_crop_nonsquare():
    rng = np.random.default_rng(2)
    img = _img(rng, h=240, w=320)
    out = apply_transform(img, ImageTransformConfig(resize_strategy="resize-crop"))
    assert out.shape == (224, 224, 3)


def test_letterbox_nonsquare():
    rng = np.random.default_rng(3)
    img = _img(rng, h=128, w=256)
    cfg = ImageTransformConfig(resize_strategy="letterbox")
    out = apply_transform(img, cfg)
    assert out.shape == (224, 224, 3)
    # top band should be (mean-filled -> normalized to ~0)
    top_band = np.asarray(out[:40])
    assert np.abs(top_band).mean() < 0.2


def test_batched_transform():
    rng = np.random.default_rng(4)
    imgs = jnp.asarray(rng.integers(0, 256, size=(2, 256, 256, 3), dtype=np.uint8))
    out = apply_transform(imgs, ImageTransformConfig())
    assert out.shape == (2, 224, 224, 3)


def test_backbone_dispatch():
    assert set(transform_configs_for_backbone("dinosiglip-vit-so-224px",
                                              "resize-naive")) == {"dino", "siglip"}
    assert transform_configs_for_backbone(
        "siglip-vit-so400m-384px", "letterbox")["siglip"].size == 384
    assert transform_configs_for_backbone(
        "clip-vit-l-336px", "letterbox")["clip"].size == 336
