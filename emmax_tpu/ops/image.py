"""Image preprocessing as jit-able JAX ops.

TPU-native replacement for the reference's torchvision transform pipelines
(``/root/reference/prismatic/models/backbones/vision/base_vision.py:154-181``
and the HF-port functional decomposition
``prismatic/extern/hf/processing_prismatic.py:32-170``): resize / resize-crop
/ letterbox + per-tower normalization run on-device, fused into the vision
forward by XLA instead of on CPU workers.

Inputs are uint8 (or float in [0, 255]) channels-last ``[..., H, W, 3]``;
outputs are normalized float32 ``[..., size, size, 3]``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

# Per-tower normalization constants (TIMM data configs resolved by
# ``dinosiglip_vit.py:71-75``).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class ImageTransformConfig:
    size: int = 224
    resize_strategy: str = "resize-naive"   # resize-naive | resize-crop | letterbox
    mean: Tuple[float, float, float] = IMAGENET_MEAN
    std: Tuple[float, float, float] = IMAGENET_STD
    interpolation: str = "bicubic"


def _resize(img: jax.Array, h: int, w: int, method: str) -> jax.Array:
    batch_dims = img.shape[:-3]
    out_shape = (*batch_dims, h, w, img.shape[-1])
    return jax.image.resize(img, out_shape, method=method)


def normalize(img: jax.Array, mean, std) -> jax.Array:
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (img - mean) / std


def apply_transform(img: jax.Array, cfg: ImageTransformConfig) -> jax.Array:
    """uint8 [..., H, W, 3] -> normalized float32 [..., size, size, 3].

    H/W must be static (jit recompiles per input resolution — in practice
    robot cameras deliver a fixed resolution, e.g. 256x256 bridge frames).
    """
    img = img.astype(jnp.float32) / 255.0
    H, W = img.shape[-3], img.shape[-2]
    s = cfg.size
    if cfg.resize_strategy == "resize-naive":
        img = _resize(img, s, s, cfg.interpolation)
    elif cfg.resize_strategy == "resize-crop":
        # torchvision semantics: Resize TRUNCATES the long side
        # (int(size*long/short), not round) and CenterCrop offsets with
        # int(round(diff/2)) — both differ by one pixel on odd remainders
        if H < W:
            nh, nw = s, max(int(W * s / H), s)
        else:
            nh, nw = max(int(H * s / W), s), s
        img = _resize(img, nh, nw, cfg.interpolation)
        top, left = int(round((nh - s) / 2)), int(round((nw - s) / 2))
        img = img[..., top:top + s, left:left + s, :]
    elif cfg.resize_strategy == "letterbox":
        # reference LetterboxPad (base_vision.py:41-50): SYMMETRIC border
        # of int(diff/2) on each side (an odd difference stays one pixel
        # off square, exactly like torchvision pad), fill = the uint8-
        # quantized mean int(m*255)/255 (the reference fills in uint8
        # space before ToTensor)
        ph = int((max(H, W) - H) / 2)
        pw = int((max(H, W) - W) / 2)
        fill = [int(float(m) * 255) / 255.0 for m in cfg.mean]
        pad_width = [(0, 0)] * (img.ndim - 3) + [
            (ph, ph), (pw, pw), (0, 0)]
        img = jnp.stack([
            jnp.pad(img[..., c], [p[:2] for p in pad_width[:-1]],
                    constant_values=fill[c])
            for c in range(3)], axis=-1)
        img = _resize(img, s, s, cfg.interpolation)
    else:
        raise ValueError(f"unknown resize strategy {cfg.resize_strategy!r}")
    return normalize(img, cfg.mean, cfg.std)


# The Emma-X dual-tower transform (dinosiglip_vit.py:33-40): one input image,
# two differently-normalized outputs.
def dinosiglip_transform_configs(size: int = 224,
                                 resize_strategy: str = "resize-naive"
                                 ) -> Dict[str, ImageTransformConfig]:
    return {
        "dino": ImageTransformConfig(size, resize_strategy,
                                     IMAGENET_MEAN, IMAGENET_STD),
        "siglip": ImageTransformConfig(size, resize_strategy,
                                       SIGLIP_MEAN, SIGLIP_STD),
    }


def transform_configs_for_backbone(vision_backbone_id: str,
                                   resize_strategy: str,
                                   size: int = 224
                                   ) -> Dict[str, ImageTransformConfig]:
    """Per-tower transforms for every reference vision backbone id."""
    if vision_backbone_id.startswith("dinosiglip"):
        size = 384 if "384" in vision_backbone_id else size
        return dinosiglip_transform_configs(size, resize_strategy)
    if vision_backbone_id.startswith("dinoclip"):
        return {"dino": ImageTransformConfig(size, resize_strategy,
                                             IMAGENET_MEAN, IMAGENET_STD),
                "clip": ImageTransformConfig(size, resize_strategy,
                                             CLIP_MEAN, CLIP_STD)}
    if vision_backbone_id.startswith("clip"):
        size = 336 if "336" in vision_backbone_id else size
        return {"clip": ImageTransformConfig(size, resize_strategy,
                                             CLIP_MEAN, CLIP_STD)}
    if vision_backbone_id.startswith("siglip"):
        size = 384 if "384" in vision_backbone_id else size
        return {"siglip": ImageTransformConfig(size, resize_strategy,
                                               SIGLIP_MEAN, SIGLIP_STD)}
    if vision_backbone_id.startswith("dinov2"):
        return {"dino": ImageTransformConfig(size, resize_strategy,
                                             IMAGENET_MEAN, IMAGENET_STD)}
    if vision_backbone_id.startswith("in1k"):
        return {"in1k": ImageTransformConfig(size, resize_strategy,
                                             IMAGENET_MEAN, IMAGENET_STD)}
    raise ValueError(f"unknown vision backbone {vision_backbone_id!r}")


def preprocess_for_towers(img: jax.Array,
                          configs: Dict[str, ImageTransformConfig]
                          ) -> Dict[str, jax.Array]:
    return {name: apply_transform(img, cfg) for name, cfg in configs.items()}
