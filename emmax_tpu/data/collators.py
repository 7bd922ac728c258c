"""Batch collators.

Counterpart of ``/root/reference/prismatic/util/data_utils.py:29-195``:
- ``collate_train`` — right-pad input_ids/labels (PAD / IGNORE_INDEX), stack
  uint8 images (``PaddedCollatorForActionPrediction``, :94-143).
- ``collate_val`` — left-pad for generation, keep string labels
  (``ValPaddedCollatorForActionPrediction``, :146-195).
- ``collate_lm`` — multimodal+text mixed batches with ``multimodal_indices``
  (``PaddedCollatorForLanguageModeling``, :29-91).

Outputs are numpy (host) — device placement/sharding happens in the loop.
Sequence lengths are bucketed to multiples of ``pad_multiple`` so XLA sees a
small, cacheable set of shapes instead of one compile per batch.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from emmax_tpu.models.llama import IGNORE_INDEX


def _bucket_len(n: int, multiple: int, max_len: int) -> int:
    return min(((n + multiple - 1) // multiple) * multiple, max_len)


def collate_train(samples: Sequence[Dict], pad_id: int,
                  max_length: int = 2048, pad_multiple: int = 64) -> Dict:
    L = _bucket_len(max(len(s["input_ids"]) for s in samples), pad_multiple,
                    max_length)
    B = len(samples)
    input_ids = np.full((B, L), pad_id, np.int32)
    labels = np.full((B, L), IGNORE_INDEX, np.int32)
    mask = np.zeros((B, L), bool)
    images = np.stack([s["image"] for s in samples])
    for i, s in enumerate(samples):
        ids = list(s["input_ids"])[:L]
        lbl = list(s["labels"])[:L]
        input_ids[i, :len(ids)] = ids
        labels[i, :len(lbl)] = lbl
        mask[i, :len(ids)] = True
    return {"input_ids": input_ids, "attention_mask": mask, "labels": labels,
            "images": images}


def collate_val(samples: Sequence[Dict], pad_id: int,
                max_length: int = 2048, pad_multiple: int = 64) -> Dict:
    L = _bucket_len(max(len(s["input_ids"]) for s in samples), pad_multiple,
                    max_length)
    B = len(samples)
    input_ids = np.full((B, L), pad_id, np.int32)
    mask = np.zeros((B, L), bool)
    images = np.stack([s["image"] for s in samples])
    for i, s in enumerate(samples):
        ids = list(s["input_ids"])[:L]
        input_ids[i, L - len(ids):] = ids       # LEFT pad
        mask[i, L - len(ids):] = True
    return {"input_ids": input_ids, "attention_mask": mask,
            "labels": [s["labels"] for s in samples], "images": images}


def collate_lm(samples: Sequence[Dict], pad_id: int,
               default_image_shape=(224, 224, 3), max_length: int = 2048,
               pad_multiple: int = 64) -> Dict:
    """Mixed multimodal/text-only batches: rows without an image get dummy
    pixels (matching the batch's real image shape, so stacking is uniform)
    and are excluded from ``multimodal_indices``."""
    for s in samples:
        if s.get("image") is not None:
            default_image_shape = s["image"].shape
            break
    base = collate_train(
        [{**s, "image": s.get("image") if s.get("image") is not None
          else np.zeros(default_image_shape, np.uint8)} for s in samples],
        pad_id, max_length, pad_multiple)
    base["multimodal_indices"] = np.asarray(
        [i for i, s in enumerate(samples) if s.get("image") is not None],
        np.int64)
    # static-shape twin of multimodal_indices for the jitted step (text-only
    # rows take the unimodal merge inside fuse_multimodal)
    base["multimodal_mask"] = np.asarray(
        [s.get("image") is not None for s in samples], bool)
    return base


class SplitModalityLoader:
    """Batch iterator with LLaVa-faithful split-modality batching
    (``util/batching.py:split_modality_batches`` ≈ reference
    ``SplitModalitySampler``, ``batching_utils.py:23-210``): batches are
    modality-pure where possible and length-sorted within each bucket; a
    trailing mixed bucket can carry both, which ``collate_lm`` handles via
    ``multimodal_mask``. The VLM-stage ``run_training`` wires this in
    (reference ``base_strategy.py:157-292``)."""

    def __init__(self, dataset, batch_size: int, collate_fn=None, *,
                 seed: int = 7, num_shards: int = 1,
                 shard_index: int = 0) -> None:
        from emmax_tpu.util.batching import split_modality_batches

        self._split = split_modality_batches
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate_fn
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        mods = dataset.modality_lengths()
        self.is_multimodal = [m for m, _ in mods]
        self.lengths = [l for _, l in mods]

    def epoch(self, epoch: int = 0):
        batches = self._split(self.lengths, self.is_multimodal,
                              self.batch_size, seed=self.seed, epoch=epoch,
                              num_shards=self.num_shards,
                              shard_index=self.shard_index)
        for idxs in batches:
            yield self.collate([self.dataset[int(j)] for j in idxs])

    def __len__(self) -> int:
        return len(self._split(self.lengths, self.is_multimodal,
                               self.batch_size, seed=self.seed, epoch=0,
                               num_shards=self.num_shards,
                               shard_index=self.shard_index))


class BatchLoader:
    """Minimal shuffling batch iterator over a map-style dataset with
    per-host sharding (replaces torch DataLoader + DistributedSampler,
    ``base_strategy.py:507-520``)."""

    def __init__(self, dataset, batch_size: int, collate_fn, *,
                 shuffle: bool = True, seed: int = 7, drop_last: bool = True,
                 num_shards: int = 1, shard_index: int = 0) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate_fn
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_shards = num_shards
        self.shard_index = shard_index

    def epoch(self, epoch: int = 0):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(order)
        order = order[self.shard_index::self.num_shards]
        step = self.batch_size
        end = (len(order) // step) * step if self.drop_last else len(order)
        for i in range(0, end, step):
            idxs = order[i:i + step]
            if not self.drop_last and len(idxs) < step:
                idxs = np.concatenate([idxs, order[:step - len(idxs)]])
            yield self.collate([self.dataset[int(j)] for j in idxs])

    def __len__(self) -> int:
        per_shard = len(self.dataset) // self.num_shards
        return per_shard // self.batch_size
