"""HF-hub-compatible facade.

Mirrors the ``declare-lab/Emma-X`` remote-code surface used by the reference
README quickstart (``/root/reference/README.md:23-52``)::

    vla = EmmaXForVision2Seq.from_pretrained(run_dir)
    processor = EmmaXProcessor.from_pretrained(run_dir)
    prompt, image = processor.get_prompt(task_label, image)
    inputs = processor(prompt, image)
    action, reasoning = vla.generate_actions(inputs, processor.tokenizer,
                                             do_sample=False,
                                             max_new_tokens=512)

and the in-repo HF port classes (``prismatic/extern/hf/processing_prismatic.py
:175-252``, ``modeling_prismatic.py:492-566``). The gripper position in the
Emma-X prompt defaults to the image-center convention used when no detector
runs; pass ``gripper_position=`` for the localized value.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from emmax_tpu.models.vla import EmmaXVLA, _as_uint8_array


class EmmaXProcessor:
    """Prompt + image packaging (``PrismaticProcessor`` role)."""

    def __init__(self, vla: EmmaXVLA) -> None:
        self._vla = vla
        self.tokenizer = vla.tokenizer

    @classmethod
    def from_pretrained(cls, path, **kw) -> "EmmaXProcessor":
        from emmax_tpu.models.load import load_vla

        return cls(load_vla(path, **kw))

    def get_prompt(self, task_label: str, image,
                   gripper_position: Optional[Sequence[int]] = None
                   ) -> Tuple[str, np.ndarray]:
        image = _as_uint8_array(image)
        if gripper_position is None:
            h, w = image.shape[:2]
            gripper_position = (w // 2, h // 2)
        prompt = self._vla.get_prompt(task_label,
                                      gripper_position=gripper_position)
        return prompt, image

    def __call__(self, prompt: str, image,
                 task_label: Optional[str] = None) -> dict:
        from emmax_tpu.extern.hf_processor import extract_instruction

        return {"prompt": prompt, "image": _as_uint8_array(image),
                "task": (task_label if task_label is not None
                         else extract_instruction(prompt))}


class EmmaXForVision2Seq:
    """Model facade (``OpenVLAForActionPrediction`` role)."""

    def __init__(self, vla: EmmaXVLA) -> None:
        self._vla = vla

    @classmethod
    def from_pretrained(cls, path, **kw) -> "EmmaXForVision2Seq":
        from emmax_tpu.models.load import load_vla

        return cls(load_vla(path, **kw))

    @property
    def vla(self) -> EmmaXVLA:
        return self._vla

    def generate_actions(self, inputs: dict, tokenizer=None, *,
                         do_sample: bool = False, max_new_tokens: int = 512,
                         type: str = "act"):
        """(actions, generated_text) — greedy only (``do_sample`` accepted
        for signature compatibility; the reference also evaluates greedy)."""
        assert not do_sample, "sampling not supported (reference uses greedy)"
        return self._vla.generate_actions(inputs["image"], inputs["prompt"],
                                          type=type,
                                          max_new_tokens=max_new_tokens)

    def predict_action(self, inputs: dict, unnorm_key: Optional[str] = None,
                       do_sample: bool = False) -> np.ndarray:
        assert not do_sample
        # the processor sets inputs["task"]; if absent (hand-built inputs),
        # recover the instruction from the prompt instead of silently
        # predicting with an empty task (round-1 plumbing hole)
        task = inputs.get("task")
        if not task:
            from emmax_tpu.extern.hf_processor import extract_instruction

            task = extract_instruction(inputs.get("prompt", ""))
        return self._vla.predict_action(inputs["image"], task,
                                        unnorm_key=unnorm_key)
