"""2D gripper localization.

Counterpart of ``/root/reference/experiments/robot/bridge/
gripper_position.py:7-112``: OWL-ViT zero-shot detection ("the black robotic
gripper") → SAM box-prompted mask → position heuristic, rescaled 224/256.
The detector models are large downloads; the detector backend is pluggable
and a deterministic fallback keeps the closed loop runnable without them.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

from emmax_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)


def mask_to_pos_naive(mask: np.ndarray, x_offset: int = 10,
                      y_offset: int = -10) -> Tuple[int, int]:
    """Bottom-right-most mask pixel + offsets (reference heuristic for the
    fingertip position, ``gripper_position.py:60-97`` shape)."""
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return 0, 0
    score = xs + ys
    i = int(np.argmax(score))
    return int(xs[i]) + x_offset, int(ys[i]) + y_offset


class HFDetectorBackend:
    """OWL-ViT + SAM backend (reference: ``gripper_position.py:99-112``).

    By default loads the pretrained checkpoints (large gated downloads).
    Pre-built ``owl_processor/owl/sam_processor/sam`` objects can be
    injected instead — used by tests to run the genuine transformers
    modeling code with tiny random-weight configs, and handy for sharing
    one detector across locators.
    """

    def __init__(self, owl_model: str = "google/owlvit-base-patch32",
                 sam_model: str = "facebook/sam-vit-base",
                 query: str = "the black robotic gripper",
                 threshold: float = 0.05,
                 owl_processor=None, owl=None,
                 sam_processor=None, sam=None) -> None:
        import torch
        from transformers import (AutoProcessor, OwlViTForObjectDetection,
                                  OwlViTProcessor, SamModel)

        self._torch = torch
        self.owl_processor = (owl_processor if owl_processor is not None
                              else OwlViTProcessor.from_pretrained(owl_model))
        self.owl = (owl if owl is not None
                    else OwlViTForObjectDetection.from_pretrained(owl_model)
                    ).eval()
        self.sam_processor = (sam_processor if sam_processor is not None
                              else AutoProcessor.from_pretrained(sam_model))
        self.sam = (sam if sam is not None
                    else SamModel.from_pretrained(sam_model)).eval()
        self.query = query
        self.threshold = threshold

    def __call__(self, image: np.ndarray) -> Optional[np.ndarray]:
        import torch
        from PIL import Image

        pil = Image.fromarray(image)
        inputs = self.owl_processor(text=[[self.query]], images=pil,
                                    return_tensors="pt")
        with torch.no_grad():
            out = self.owl(**inputs)
        target_size = torch.tensor([pil.size[::-1]])
        det = self.owl_processor.post_process_object_detection(
            out, threshold=self.threshold, target_sizes=target_size)[0]
        if len(det["boxes"]) == 0:
            return None
        box = det["boxes"][det["scores"].argmax()].tolist()
        sam_in = self.sam_processor(pil, input_boxes=[[box]],
                                    return_tensors="pt")
        with torch.no_grad():
            sam_out = self.sam(**sam_in)
        masks = self.sam_processor.image_processor.post_process_masks(
            sam_out.pred_masks.cpu(), sam_in["original_sizes"].cpu(),
            sam_in["reshaped_input_sizes"].cpu())[0]
        return masks[0, 0].numpy().astype(bool)


class GripperLocator:
    """image (uint8 [H, W, 3]) → (x, y) in model coordinates (224-scale)."""

    def __init__(self, backend: Optional[Callable] = None,
                 model_size: int = 224) -> None:
        self.backend = backend
        self.model_size = model_size
        self._warned = False

    def __call__(self, image: np.ndarray) -> Tuple[int, int]:
        H, W = image.shape[:2]
        mask = None
        if self.backend is not None:
            try:
                mask = self.backend(image)
            except Exception as e:
                if not self._warned:
                    overwatch.warning(f"gripper detector failed: {e}")
                    self._warned = True
        if mask is None:
            # deterministic fallback: darkest region (the WidowX gripper is
            # black) — keeps the loop runnable without detectors
            gray = image.astype(np.float32).mean(-1)
            mask = gray <= gray.min() + 10.0
        x, y = mask_to_pos_naive(mask)
        # rescale to model (224) coordinates (gripper_position.py:99-112)
        return (int(round(x * self.model_size / W)),
                int(round(y * self.model_size / H)))
