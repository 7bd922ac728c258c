"""VLM pretraining datasets (LLaVa-style align / finetune stages).

Counterpart of ``/root/reference/prismatic/preprocessing/datasets/
datasets.py:29-200``: ``AlignDataset`` (single caption turn, supervision on
the caption only) and ``FinetuneDataset`` (full multi-turn conversations,
supervision on GPT turns), over the LLaVa chat-JSON format
``[{"image": rel_path?, "conversations": [{"from": "human"|"gpt",
"value": ...}, ...]}, ...]``. Mixed batches (rows without images) are
supported through ``collate_lm``'s ``multimodal_indices``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from emmax_tpu.models.llama import IGNORE_INDEX
from emmax_tpu.vla.prompting import PromptBuilder


def _load_image(root: Path, rel) -> Optional[np.ndarray]:
    if rel is None:
        return None
    import cv2

    img = cv2.imread(str(Path(root) / rel), cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(Path(root) / rel)
    return img[..., ::-1].copy()


class AlignDataset:
    """Caption-only alignment stage: ``<image> caption`` becomes
    ``{bos} caption{eos}`` with patches spliced after BOS; everything except
    the caption is ignored in the loss (reference :49-89)."""

    def __init__(self, chat_json, image_dir, tokenizer,
                 image_loader=_load_image) -> None:
        with open(chat_json) as f:
            self.examples = json.load(f)
        self.image_dir = Path(image_dir)
        self.tokenizer = tokenizer
        self.image_loader = image_loader

    def __len__(self) -> int:
        return len(self.examples)

    def modality_lengths(self):
        """[(is_multimodal, approx_length)] without touching images —
        feeds the split-modality sampler (reference
        ``datasets.py get_modality_lengths`` / ``batching_utils.py:23``)."""
        return [(ex.get("image") is not None,
                 sum(len(turn["value"].split())
                     for turn in ex["conversations"]))
                for ex in self.examples]

    def __getitem__(self, idx: int) -> Dict:
        ex = self.examples[idx]
        caption = ex["conversations"][-1]["value"].replace("<image>", "").strip()
        ids = self.tokenizer.encode(caption, add_special_tokens=True)
        ids = ids + [self.tokenizer.eos_id]
        labels = list(ids)
        labels[0] = IGNORE_INDEX  # BOS
        image = self.image_loader(self.image_dir, ex.get("image"))
        return {"image": image, "input_ids": ids, "labels": labels}


class FinetuneDataset:
    """Multi-turn instruct stage: full conversation through the prompt
    builder; only GPT-turn tokens are supervised (reference :92-200)."""

    def __init__(self, chat_json, image_dir, tokenizer,
                 prompt_style: str = "vicuna-v15",
                 image_loader=_load_image) -> None:
        with open(chat_json) as f:
            self.examples = json.load(f)
        self.image_dir = Path(image_dir)
        self.tokenizer = tokenizer
        self.prompt_style = prompt_style
        self.image_loader = image_loader

    def __len__(self) -> int:
        return len(self.examples)

    def modality_lengths(self):
        """[(is_multimodal, approx_length)] without touching images —
        feeds the split-modality sampler (reference
        ``datasets.py get_modality_lengths`` / ``batching_utils.py:23``)."""
        return [(ex.get("image") is not None,
                 sum(len(turn["value"].split())
                     for turn in ex["conversations"]))
                for ex in self.examples]

    def __getitem__(self, idx: int) -> Dict:
        ex = self.examples[idx]
        pb = PromptBuilder(self.prompt_style)
        input_ids: List[int] = []
        labels: List[int] = []
        for t, turn in enumerate(ex["conversations"]):
            wrapped = pb.add_turn(turn["from"], turn["value"])
            if t == 0:
                msg = pb.get_prompt()  # strips bos prefix handling
                turn_ids = self.tokenizer.encode(msg, add_special_tokens=True)
            else:
                turn_ids = self.tokenizer.encode(wrapped,
                                                 add_special_tokens=False)
            is_gpt = turn["from"] == "gpt"
            input_ids.extend(turn_ids)
            labels.extend(turn_ids if is_gpt
                          else [IGNORE_INDEX] * len(turn_ids))
        image = self.image_loader(self.image_dir, ex.get("image"))
        return {"image": image, "input_ids": input_ids, "labels": labels}


class ValDataset:
    """Map-style GCOT val dataset returning raw image + prompt string + gt
    text (reference ``prismatic/vla/datasets/val_dataset.py:12-127``)."""

    def __init__(self, data, action_tokenizer, frame_source,
                 data_mix: str = "movement_policy") -> None:
        from emmax_tpu.data.gcot import assemble_gcot_text, parse_image_path

        if isinstance(data, (str, Path)):
            with open(data) as f:
                data = json.load(f)
        self.data = list(data)
        self.action_tokenizer = action_tokenizer
        self.frame_source = frame_source
        self.data_mix = data_mix
        self._assemble = assemble_gcot_text
        self._parse = parse_image_path

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, idx: int) -> Dict:
        item = self.data[idx]
        key, frame_idx = self._parse(item["current_image_path"])
        image = self.frame_source.get_frame(key, frame_idx)
        prompt_str, gt = self._assemble(item, self.data_mix,
                                        self.action_tokenizer)
        pb = PromptBuilder("pure")
        pb.add_turn("human", prompt_str)
        return {"image": image, "prompt": pb.get_prompt(), "ground_truth": gt}


def make_synthetic_chat_json(path, n: int, with_images: bool = True,
                             image_dir: Optional[Path] = None,
                             text_only_every: int = 0) -> None:
    """Synthetic LLaVa-format data for tests/smoke runs.
    ``text_only_every=k``: every k-th example has no image (mixed-modality
    pretraining corpora, reference ``data_utils.py:55-83``)."""
    import cv2

    examples = []
    rng = np.random.default_rng(0)
    for i in range(n):
        ex = {"conversations": [
            {"from": "human", "value": f"<image>\nWhat is in image {i}?"},
            {"from": "gpt", "value": f"A synthetic object number {i}."},
        ]}
        text_only = text_only_every and i % text_only_every == 0
        if with_images and image_dir is not None and not text_only:
            rel = f"img_{i}.jpg"
            img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
            Path(image_dir).mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(Path(image_dir) / rel), img[..., ::-1])
            ex["image"] = rel
        examples.append(ex)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(examples, f)
