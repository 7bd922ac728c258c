"""Cross-epoch vision-feature caching for frozen-tower training stages.

In the reference's align stage the vision towers are frozen
(``/root/reference/prismatic/models/vlms/prismatic.py:133-159``,
``freeze_backbones("align")``), so each sample's tower output is a constant
— yet the reference re-runs DINOv2-L + SigLIP-400M over every image every
epoch. ``CachedVisionLoader`` wraps any VLM-stage batch loader and replaces
each batch's raw uint8 ``images`` with pre-projector channel-concat tower
features (``{"tower_features": [B, P, C]}``, consumed by
``vlm_forward``/``encode_images``), cached across epochs by image content
hash. The projector still trains; outputs are bit-identical to the tower
path (``tests/test_vlm.py::test_cached_tower_features_parity``).

Wins: the tower forward runs once per UNIQUE image instead of once per
epoch (epochs 2+ skip it entirely), and a step over cached features no
longer needs ``params["vision"]`` on device (−1.33 GB at the 7B align
scale — see ``bench_train_step.py --cached_vision``).
"""

from __future__ import annotations

import hashlib
from typing import Dict, Optional

import jax
import numpy as np

from emmax_tpu.models.vlm import VLMConfig, encode_tower_features
from emmax_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)


class CachedVisionLoader:
    """Wrap a loader whose batches carry uint8 ``images`` [B, H, W, 3].

    ``transforms``: tower → ImageTransformConfig (the same dict the train
    step would otherwise receive) — preprocessing runs ON DEVICE inside the
    jitted encode, so only the uint8 frame crosses host→HBM on a miss.
    Pass ``attn_impl``/``compute_dtype`` to match the training step.

    The wrapped batches keep every other key (labels, masks,
    ``multimodal_mask``...), drop ``images``, and gain
    ``pixel_values={"tower_features": [B, P, C]}``. Text-only rows (zero
    images from ``collate_lm``) cache like any other content hash and are
    ignored downstream by the unimodal merge.

    The loader owns PRIVATE copies of the vision params (the donating
    train step would otherwise delete shared buffers out from under it).
    For the full memory win, build the train state WITHOUT
    ``params["vision"]`` (the cached step never reads it) and call
    ``release_towers()`` once the dataset has been fully seen (epoch 2+
    never encodes again).
    """

    def __init__(self, loader, params, cfg: VLMConfig, transforms: Dict, *,
                 attn_impl: str = "xla", compute_dtype=None,
                 capacity: Optional[int] = None) -> None:
        import jax.numpy as jnp

        self.loader = loader
        self.capacity = capacity
        self._store: Dict[bytes, np.ndarray] = {}
        self.encodes = 0          # tower-forward dispatch count (for tests)
        cdtype = compute_dtype or jnp.bfloat16
        # private copies: donation-proof (see class docstring)
        self._vparams = {"vision": jax.tree_util.tree_map(
            jnp.array, params["vision"])}

        def encode(vparams, images):
            # vparams is an ARGUMENT, not a closure capture: closures embed
            # arrays as executable constants (huge programs on a remote
            # compiler) and would pin the towers past release_towers()
            from emmax_tpu.ops.image import preprocess_for_towers

            pv = {k: v.astype(cdtype)
                  for k, v in preprocess_for_towers(images,
                                                    transforms).items()}
            return encode_tower_features(vparams, cfg, pv,
                                         attn_impl=attn_impl)

        self._encode = jax.jit(encode)

    def release_towers(self) -> None:
        """Free the loader's private tower params (call once every sample
        has been seen — epochs 2+ are pure cache hits)."""
        self._vparams = None

    @staticmethod
    def _key(row: np.ndarray) -> bytes:
        return hashlib.blake2b(row.tobytes(), digest_size=16).digest()

    def _features(self, images: np.ndarray) -> np.ndarray:
        keys = [self._key(r) for r in images]
        missing = [i for i, k in enumerate(keys) if k not in self._store]
        if missing:
            if self._vparams is None:
                raise RuntimeError(
                    "CachedVisionLoader: cache miss after release_towers() "
                    "— release only once every sample has been encoded")
            # one device dispatch for the whole batch even on partial miss:
            # encoding is batched anyway and re-encoding a few cached rows
            # is cheaper than a second differently-shaped executable
            feats = np.asarray(self._encode(self._vparams, images))
            self.encodes += 1
            for i in missing:
                self._store[keys[i]] = feats[i]
            if self.capacity is not None and len(self._store) > self.capacity:
                overwatch.warning(
                    f"CachedVisionLoader over capacity "
                    f"({len(self._store)} > {self.capacity}); dropping "
                    f"oldest entries")
                while len(self._store) > self.capacity:
                    self._store.pop(next(iter(self._store)))
            return feats
        return np.stack([self._store[k] for k in keys])

    def epoch(self, epoch: int = 0):
        for batch in self.loader.epoch(epoch):
            feats = self._features(np.asarray(batch["images"]))
            out = {k: v for k, v in batch.items() if k != "images"}
            out["pixel_values"] = {"tower_features": feats}
            yield out

    def __len__(self) -> int:
        return len(self.loader)
