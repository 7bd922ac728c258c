"""Transformers-compatible processor classes for the HF extern port.

Counterpart of the reference Hub processor
(``/root/reference/prismatic/extern/hf/processing_prismatic.py:32-252``):

- ``EmmaXImageProcessor`` — a JSON-serializable decomposition of the image
  pipeline into functional resize/crop/normalize parameters (the reference
  parses a TIMM ``Compose`` into ``tvf_*_params`` dicts for the same
  reason, ``processing_prismatic.py:96-125``). Application runs through the
  repo's jit-able ``ops/image`` path (TPU-first; no torchvision).
- ``EmmaXProcessor`` — tokenizer + image processor combiner with the
  README-quickstart ``get_prompt(task_label, image)`` surface. Its
  ``__call__`` carries the task instruction through to ``predict_action``
  (the round-1 facade silently dropped it).

Both serialize to/from ``preprocessor_config.json`` via
``save_pretrained`` / ``from_pretrained``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
from transformers.image_processing_utils import ImageProcessingMixin

from emmax_tpu.ops.image import ImageTransformConfig


def _as_uint8(image) -> np.ndarray:
    from emmax_tpu.models.vla import _as_uint8_array

    return _as_uint8_array(image)


class EmmaXImageProcessor(ImageProcessingMixin):
    """Per-tower functional image pipeline, JSON-serializable."""

    model_input_names = ["pixel_values"]

    def __init__(self,
                 tower_names: Optional[List[str]] = None,
                 input_sizes: Optional[List[int]] = None,
                 means: Optional[List[Tuple[float, float, float]]] = None,
                 stds: Optional[List[Tuple[float, float, float]]] = None,
                 interpolations: Optional[List[str]] = None,
                 image_resize_strategy: str = "resize-naive",
                 **kwargs: Any) -> None:
        self.tower_names = tower_names or ["dino", "siglip"]
        n = len(self.tower_names)
        self.input_sizes = input_sizes or [224] * n
        self.means = [list(m) for m in (means or [(0.5, 0.5, 0.5)] * n)]
        self.stds = [list(s) for s in (stds or [(0.5, 0.5, 0.5)] * n)]
        self.interpolations = interpolations or ["bicubic"] * n
        self.image_resize_strategy = image_resize_strategy
        super().__init__(**kwargs)

    @classmethod
    def for_backbone(cls, vision_backbone_id: str,
                     image_resize_strategy: str = "resize-naive"
                     ) -> "EmmaXImageProcessor":
        """Build from a backbone id via the repo transform registry."""
        from emmax_tpu.ops.image import transform_configs_for_backbone

        cfgs = transform_configs_for_backbone(vision_backbone_id,
                                              image_resize_strategy)
        names = list(cfgs)
        return cls(tower_names=names,
                   input_sizes=[cfgs[n].size for n in names],
                   means=[list(cfgs[n].mean) for n in names],
                   stds=[list(cfgs[n].std) for n in names],
                   interpolations=[cfgs[n].interpolation for n in names],
                   image_resize_strategy=image_resize_strategy)

    def transform_configs(self) -> Dict[str, ImageTransformConfig]:
        return {
            name: ImageTransformConfig(
                size=self.input_sizes[i],
                resize_strategy=self.image_resize_strategy,
                mean=tuple(self.means[i]), std=tuple(self.stds[i]),
                interpolation=self.interpolations[i])
            for i, name in enumerate(self.tower_names)
        }

    def preprocess(self, images, return_stacked: bool = False):
        """uint8 image(s) → per-tower normalized pixel dict
        ``{tower: [B, S, S, 3] f32}`` (the model-side contract), or — with
        ``return_stacked`` — the reference's channel-stacked ``[B, 3*T, S,
        S]`` array (``processing_prismatic.py:138-145``)."""
        import jax.numpy as jnp

        from emmax_tpu.ops.image import preprocess_for_towers

        arr = _as_uint8(images)
        if arr.ndim == 3:
            arr = arr[None]
        pixels = preprocess_for_towers(jnp.asarray(arr),
                                       self.transform_configs())
        if not return_stacked:
            return {k: np.asarray(v) for k, v in pixels.items()}
        # NHWC → NCHW per tower, stacked on the channel dim
        chans = [np.moveaxis(np.asarray(pixels[n]), -1, 1)
                 for n in self.tower_names]
        return np.concatenate(chans, axis=1)

    def __call__(self, images, **kw):
        return self.preprocess(images, **kw)


class EmmaXProcessor:
    """Tokenizer + image-processor combiner (``PrismaticProcessor`` role,
    ``processing_prismatic.py:175-252``) with the Hub ``get_prompt``."""

    def __init__(self, image_processor: EmmaXImageProcessor, tokenizer,
                 llm_family: str = "llama2") -> None:
        self.image_processor = image_processor
        self.tokenizer = tokenizer
        self.llm_family = llm_family

    # -- prompts ----------------------------------------------------------
    def get_prompt(self, task_label: str, image,
                   gripper_position: Optional[Sequence[int]] = None
                   ) -> Tuple[str, np.ndarray]:
        """README quickstart surface (README.md:44): returns (prompt, image);
        the image-center gripper convention applies when no detector runs."""
        from emmax_tpu.vla.prompting import get_prompt_builder

        image = _as_uint8(image)
        if gripper_position is None:
            h, w = image.shape[:2]
            gripper_position = (w // 2, h // 2)
        pb = get_prompt_builder(self.llm_family)
        pb.add_turn("human", (
            "What action should the robot take to achieve the instruction"
            f"\nINSTRUCTION: \n{task_label}\nCURRENT GRIPPER: "
            f"[{int(gripper_position[0])}, {int(gripper_position[1])}]\n"))
        return pb.get_prompt(), image

    def __call__(self, prompt: str, image,
                 task_label: Optional[str] = None) -> Dict[str, Any]:
        """Returns model inputs incl. tokenized ids, per-tower pixels, and
        the task instruction (``task``) so OpenVLA-style ``predict_action``
        receives it (round-1 hole: the facade read ``inputs["task"]`` but
        the processor never set it)."""
        image = _as_uint8(image)
        return {
            "prompt": prompt,
            "input_ids": np.asarray([self.tokenizer.encode(prompt)], np.int32),
            "image": image,
            "pixel_values": self.image_processor.preprocess(image),
            "task": (task_label if task_label is not None
                     else extract_instruction(prompt)),
        }

    # -- (de)serialization --------------------------------------------------
    def save_pretrained(self, path) -> None:
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        self.image_processor.save_pretrained(path)
        blob = json.loads((path / "preprocessor_config.json").read_text())
        blob["llm_family"] = self.llm_family
        blob["tokenizer"] = {
            "kind": type(self.tokenizer).__name__,
            "vocab_size": int(self.tokenizer.vocab_size),
        }
        (path / "preprocessor_config.json").write_text(
            json.dumps(blob, indent=2))

    @classmethod
    def from_pretrained(cls, path, tokenizer=None) -> "EmmaXProcessor":
        path = Path(path)
        blob = json.loads((path / "preprocessor_config.json").read_text())
        llm_family = blob.pop("llm_family", "llama2")
        tok_info = blob.pop("tokenizer", {})
        image_processor, _ = EmmaXImageProcessor.from_dict(
            blob, return_unused_kwargs=True)
        if tokenizer is None:
            from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

            tokenizer = ByteLevelTokenizer(
                vocab_size=int(tok_info.get("vocab_size", 32000)))
        return cls(image_processor, tokenizer, llm_family=llm_family)


def extract_instruction(prompt: str) -> str:
    """Recover the task instruction from a built Emma-X/OpenVLA prompt
    (inverse of the ``INSTRUCTION:`` template in ``run_bridgev2_eval.py:167``
    and the OpenVLA ``to {task}?`` wrap)."""
    if "INSTRUCTION:" in prompt:
        tail = prompt.split("INSTRUCTION:", 1)[1]
        tail = tail.split("CURRENT GRIPPER", 1)[0]
        return tail.strip()
    marker = "What action should the robot take to "
    if marker in prompt:
        tail = prompt.split(marker, 1)[1]
        for stop in ("?", "\n"):
            if stop in tail:
                tail = tail.split(stop, 1)[0]
        return tail.strip()
    return ""
