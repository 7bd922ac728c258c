"""VLA dataset/collator factories.

Counterpart of ``/root/reference/prismatic/vla/materialize.py:20-103``:
``get_vla_dataset_and_collator`` (OpenVLA RLDS path) and
``get_discrete_dataset_and_collator`` (Emma-X GCOT path: map-style dataset +
right-pad train collator + left-pad val collator; the reference uses the
train set for val too, :99).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

from emmax_tpu.data.collators import collate_train, collate_val
from emmax_tpu.vla.action_tokenizer import ActionTokenizer


def get_vla_dataset_and_collator(
    data_root_dir,
    data_mix: str,
    action_tokenizer: ActionTokenizer,
    tokenizer,
    *,
    prompt_style: str = "pure",
    shuffle_buffer_size: int = 10_000,
    train: bool = True,
    resize_resolution: Optional[Tuple[int, int]] = None,
    predict_stop_token: bool = True,
    image_aug: bool = False,
    cache_dir=None,
):
    """(streaming dataset, collator) for the RLDS action-token path.

    ``image_aug=True`` turns on the OpenVLA training augmentation recipe
    (reference ``vla/materialize.py:32,51`` → ``datasets.py:127-141``).
    """
    from emmax_tpu.data.rlds_vla import (RLDSBatchTransform,
                                         RLDSIterableDataset)

    transform = RLDSBatchTransform(action_tokenizer, tokenizer,
                                   prompt_style=prompt_style,
                                   predict_stop_token=predict_stop_token)
    dataset = RLDSIterableDataset(data_root_dir, data_mix, transform,
                                  resize_resolution=resize_resolution,
                                  shuffle_buffer_size=shuffle_buffer_size,
                                  train=train, image_aug=image_aug,
                                  cache_dir=cache_dir)
    collator = partial(collate_train, pad_id=tokenizer.pad_id)
    return dataset, collator


def get_discrete_dataset_and_collator(
    data_root_dir,
    file_name: str,
    action_tokenizer: ActionTokenizer,
    tokenizer,
    frame_source,
    *,
    data_mix: str = "movement_policy",
    mask_inst: bool = True,
    prompt_style: str = "pure",
    max_length: int = 2048,
):
    """(train dataset, val dataset, train collator, val collator) for the
    GCOT path."""
    from pathlib import Path

    from emmax_tpu.data.gcot import GCOTDataset

    path = Path(data_root_dir) / file_name
    train_ds = GCOTDataset(path, action_tokenizer, tokenizer, frame_source,
                           data_mix=data_mix, mask_inst=mask_inst,
                           split="train", prompt_style=prompt_style)
    # reference quirk preserved: val dataset IS the train dataset in val mode
    # (vla/materialize.py:99)
    val_ds = GCOTDataset(path, action_tokenizer, tokenizer, frame_source,
                         data_mix=data_mix, split="val",
                         prompt_style=prompt_style)
    train_collator = partial(collate_train, pad_id=tokenizer.pad_id,
                             max_length=max_length)
    val_collator = partial(collate_val, pad_id=tokenizer.pad_id,
                           max_length=max_length)
    return train_ds, val_ds, train_collator, val_collator
