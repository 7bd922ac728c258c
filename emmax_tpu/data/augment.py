"""Stateless per-frame image augmentation (dlimp-equivalent, pure TF).

The reference's training augmentation path is
``apply_frame_transforms`` → ``obs_transforms.augment`` →
``dl.transforms.augment_image``
(``/root/reference/prismatic/vla/datasets/rlds/dataset.py:636-643``,
``obs_transforms.py:17-42``), with the external ``dlimp`` library providing
the op implementations. dlimp is not in this image, so the ops are
re-implemented here with TF *stateless* random ops: same op vocabulary, same
kwargs shapes as the reference config
(``/root/reference/prismatic/vla/datasets/datasets.py:128-141`` —
``random_resized_crop(scale, ratio)``, ``random_brightness=[max_delta]``,
``random_contrast=[lo, hi]``, ``random_saturation=[lo, hi]``,
``random_hue=[max_delta]``, applied in ``augment_order``), and the same
dtype contract (uint8 in → uint8 out; photometric ops run in float [0, 1]
with clipping).

Every op takes an explicit ``seed`` (shape-[2] int32) and is deterministic
given it; per-op seeds are decorrelated by folding the op index in, so the
whole ``augment_image`` call is a pure function of (image, seed, kwargs) —
the property the TPU data plane needs for reproducible input pipelines.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

try:  # TF is host-only and optional (same gate as emmax_tpu.data.rlds)
    import tensorflow as tf

    HAVE_TF = True
except Exception:  # pragma: no cover
    tf = None
    HAVE_TF = False


def _fold(seed, i: int):
    """Derive a decorrelated per-op seed from the frame seed."""
    return tf.stack([seed[0] + i * 0x9E37, seed[1] + i])


def random_resized_crop(image, scale: Sequence[float],
                        ratio: Sequence[float], seed):
    """Random area-scale + log-aspect crop, resized back to the input size
    (torchvision RandomResizedCrop semantics; the Emma-X config pins
    scale=[0.9, 0.9], ratio=[1.0, 1.0] → fixed-size random-offset crop)."""
    height = tf.cast(tf.shape(image)[-3], tf.float32)
    width = tf.cast(tf.shape(image)[-2], tf.float32)

    area = tf.random.stateless_uniform([], _fold(seed, 0),
                                       minval=scale[0], maxval=scale[1] + 1e-9)
    log_ratio = tf.random.stateless_uniform(
        [], _fold(seed, 1),
        minval=tf.math.log(float(ratio[0])),
        maxval=tf.math.log(float(ratio[1])) + 1e-9)
    aspect = tf.exp(log_ratio)

    # torchvision defines the aspect ratio in PIXEL space (crop_w/crop_h in
    # pixels) — converting to fractional coordinates folds in the image's
    # own aspect (fh = sqrt(area·W/(aspect·H)), fw = sqrt(area·aspect·H/W));
    # without it a ratio=[1,1] crop of a 640x480 image came out 4:3, not
    # square. Square inputs (the shipped Emma-X recipe) are unaffected.
    # clip keeps the box inside the image for any (scale, ratio) combo
    img_aspect = width / height
    new_h = tf.clip_by_value(tf.sqrt(area * img_aspect / aspect), 0.0, 1.0)
    new_w = tf.clip_by_value(tf.sqrt(area * aspect / img_aspect), 0.0, 1.0)
    off_h = tf.random.stateless_uniform([], _fold(seed, 2)) * (1.0 - new_h)
    off_w = tf.random.stateless_uniform([], _fold(seed, 3)) * (1.0 - new_w)

    boxes = tf.stack([off_h, off_w, off_h + new_h, off_w + new_w])[None]
    squeeze = image.shape.ndims == 3
    batch = image[None] if squeeze else image
    out = tf.image.crop_and_resize(
        tf.cast(batch, tf.float32), boxes,
        tf.zeros([tf.shape(batch)[0]], tf.int32),
        tf.stack([tf.cast(height, tf.int32), tf.cast(width, tf.int32)]))
    out = tf.clip_by_value(out, 0.0, 1.0)
    return out[0] if squeeze else out


def random_brightness(image, max_delta: float, seed):
    return tf.clip_by_value(
        tf.image.stateless_random_brightness(image, max_delta, seed), 0.0, 1.0)


def random_contrast(image, lower: float, upper: float, seed):
    return tf.clip_by_value(
        tf.image.stateless_random_contrast(image, lower, upper, seed),
        0.0, 1.0)


def random_saturation(image, lower: float, upper: float, seed):
    return tf.clip_by_value(
        tf.image.stateless_random_saturation(image, lower, upper, seed),
        0.0, 1.0)


def random_hue(image, max_delta: float, seed):
    return tf.clip_by_value(
        tf.image.stateless_random_hue(image, max_delta, seed), 0.0, 1.0)


def random_flip_left_right(image, seed):
    return tf.image.stateless_random_flip_left_right(image, seed)


def random_flip_up_down(image, seed):
    return tf.image.stateless_random_flip_up_down(image, seed)


# kwargs arity: list args are splatted positionally (dlimp convention —
# `random_brightness=[0.2]` → max_delta=0.2, `random_contrast=[0.8, 1.2]`
# → (lower, upper)); dict args are splatted as keywords.
AUGMENT_OPS = {
    "random_resized_crop": random_resized_crop,
    "random_brightness": random_brightness,
    "random_contrast": random_contrast,
    "random_saturation": random_saturation,
    "random_hue": random_hue,
    "random_flip_left_right": random_flip_left_right,
    "random_flip_up_down": random_flip_up_down,
}


def augment_image(image, seed, *, augment_order: List[str], **augment_kwargs):
    """Apply the ops named in ``augment_order`` with their kwargs, each with a
    decorrelated stateless seed. uint8 images round-trip through float [0, 1]
    (dlimp ``augment_image`` contract)."""
    in_dtype = image.dtype
    if in_dtype != tf.float32:
        image = tf.image.convert_image_dtype(image, tf.float32)
    for i, name in enumerate(augment_order):
        if name not in AUGMENT_OPS:
            raise ValueError(f"unknown augmentation op: {name}")
        op_seed = _fold(seed, 100 + 10 * i)
        args = augment_kwargs.get(name, [])
        if isinstance(args, dict):
            image = AUGMENT_OPS[name](image, seed=op_seed, **args)
        elif isinstance(args, (list, tuple)):
            image = AUGMENT_OPS[name](image, *args, op_seed)
        else:
            image = AUGMENT_OPS[name](image, args, op_seed)
    if in_dtype != tf.float32:
        image = tf.image.convert_image_dtype(image, in_dtype, saturate=True)
    return image


# The exact augmentation recipe Emma-X / OpenVLA trains with
# (/root/reference/prismatic/vla/datasets/datasets.py:128-141).
OPENVLA_IMAGE_AUGMENT_KWARGS: Dict = dict(
    random_resized_crop=dict(scale=[0.9, 0.9], ratio=[1.0, 1.0]),
    random_brightness=[0.2],
    random_contrast=[0.8, 1.2],
    random_saturation=[0.8, 1.2],
    random_hue=[0.05],
    augment_order=[
        "random_resized_crop",
        "random_brightness",
        "random_contrast",
        "random_saturation",
        "random_hue",
    ],
)
