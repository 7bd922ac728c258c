"""Image preprocessing parity vs PIL (the reference's actual resize backend).

The reference transforms are TIMM/torchvision Compose chains
(``dinosiglip_vit.py:77-111``) whose Resize runs through PIL bicubic.
Our jit-able ``apply_transform`` mirrors them with ``jax.image.resize``;
the bicubic kernels differ slightly (PIL antialiases with a support-scaled
filter), so parity is asserted at a documented tolerance rather than
bit-exactness. Normalization itself is exact.
"""

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

from emmax_tpu.ops.image import (IMAGENET_MEAN, IMAGENET_STD, SIGLIP_MEAN,
                                 SIGLIP_STD, ImageTransformConfig,
                                 apply_transform)


def _smooth_image(rng, h=256, w=256):
    """Low-frequency image (keeps resize-kernel differences small)."""
    small = rng.uniform(0, 255, size=(8, 8, 3))
    img = np.kron(small, np.ones((h // 8, w // 8, 1)))
    return img.astype(np.uint8)


def _pil_reference(img, size, mean, std):
    """PIL bicubic resize → scale to [0,1] → normalize (TIMM semantics)."""
    pil = Image.fromarray(img).resize((size, size), Image.BICUBIC)
    arr = np.asarray(pil).astype(np.float32) / 255.0
    return (arr - np.asarray(mean)) / np.asarray(std)


@pytest.mark.parametrize("mean,std", [(IMAGENET_MEAN, IMAGENET_STD),
                                      (SIGLIP_MEAN, SIGLIP_STD)])
def test_resize_naive_close_to_pil(mean, std):
    rng = np.random.default_rng(0)
    img = _smooth_image(rng)
    ours = np.asarray(apply_transform(
        img, ImageTransformConfig(size=224, mean=mean, std=std)))
    ref = _pil_reference(img, 224, mean, std)
    assert ours.shape == ref.shape == (224, 224, 3)
    # normalized units: mean abs diff well under one std
    mad = np.abs(ours - ref).mean()
    assert mad < 0.03, mad
    corr = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999


def test_identity_resolution_is_exact():
    """When no resize happens, normalization must be exact."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(224, 224, 3), dtype=np.uint8)
    ours = np.asarray(apply_transform(
        img, ImageTransformConfig(size=224, mean=IMAGENET_MEAN,
                                  std=IMAGENET_STD)))
    ref = ((img.astype(np.float32) / 255.0 - np.asarray(IMAGENET_MEAN))
           / np.asarray(IMAGENET_STD))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_camera_resolution_roundtrip():
    """Bridge cameras deliver 256x256; the dual-tower transform stays close
    to the PIL reference on realistic (smooth-ish) content."""
    rng = np.random.default_rng(2)
    img = _smooth_image(rng, 256, 256)
    for mean, std in [(IMAGENET_MEAN, IMAGENET_STD), (SIGLIP_MEAN, SIGLIP_STD)]:
        ours = np.asarray(apply_transform(
            img, ImageTransformConfig(size=224, mean=mean, std=std)))
        ref = _pil_reference(img, 224, mean, std)
        assert np.abs(ours - ref).mean() < 0.03
