"""Contract test for the OWL-ViT + SAM gripper-localizer backend.

The real checkpoints are large gated downloads (no egress here), so the
transformers classes are replaced with fakes that honor the exact call
contract ``HFDetectorBackend`` relies on (reference pipeline:
``/root/reference/experiments/robot/bridge/gripper_position.py:99-112``):
processor(text, images) -> model(**inputs) -> post_process_object_detection
(boxes/scores) -> SAM box prompt -> post_process_masks. This pins the
box -> best-score selection -> mask -> ``mask_to_pos_naive`` -> 224/256
rescale plumbing without any download.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from emmax_tpu.experiments.gripper import GripperLocator, HFDetectorBackend


class _FakeOwlProcessor:
    """Detects the brightest-red rectangle; emits (score, box) pairs."""

    def __call__(self, *, text, images, return_tensors):
        assert return_tensors == "pt"
        self._img = np.asarray(images)
        return {"pixel_values": torch.zeros(1)}

    def post_process_object_detection(self, outputs, *, threshold,
                                      target_sizes):
        h, w = [int(v) for v in target_sizes[0]]
        assert (h, w) == self._img.shape[:2]
        red = (self._img[..., 0] > 200) & (self._img[..., 1] < 50)
        if not red.any():
            return [{"boxes": torch.zeros((0, 4)),
                     "scores": torch.zeros((0,))}]
        ys, xs = np.nonzero(red)
        box = [xs.min(), ys.min(), xs.max(), ys.max()]
        # a decoy low-score box first: the backend must pick by argmax score
        return [{"boxes": torch.tensor([[0.0, 0.0, 4.0, 4.0], box],
                                       dtype=torch.float32),
                 "scores": torch.tensor([0.10, 0.90])}]


class _FakeSamProcessor:
    def __init__(self):
        self.image_processor = self

    def __call__(self, pil, *, input_boxes, return_tensors):
        assert return_tensors == "pt"
        self._box = [int(v) for v in input_boxes[0][0]]
        img = np.asarray(pil)
        return {"original_sizes": torch.tensor([list(img.shape[:2])]),
                "reshaped_input_sizes": torch.tensor([[64, 64]])}

    def post_process_masks(self, pred_masks, original_sizes,
                           reshaped_input_sizes):
        h, w = [int(v) for v in original_sizes[0]]
        x0, y0, x1, y1 = self._box
        mask = torch.zeros((1, 1, h, w), dtype=torch.bool)
        mask[0, 0, y0:y1 + 1, x0:x1 + 1] = True      # fill the prompt box
        return [mask]


class _FakeModel:
    def __init__(self, out=None):
        self._out = out

    def eval(self):
        return self

    def __call__(self, **inputs):
        return self._out


class _Out:
    pred_masks = torch.zeros((1, 1, 1, 4, 4))


@pytest.fixture()
def fake_transformers(monkeypatch):
    import sys

    import transformers

    # transformers swaps its sys.modules entry for a _LazyModule on FIRST
    # attribute access, so patching the object a first-time `import
    # transformers` bound is invisible to later `from transformers import
    # ...` — force the swap, then patch the live sys.modules entry
    _ = transformers.OwlViTProcessor
    transformers = sys.modules["transformers"]

    def fp(obj):
        return type("FP", (), {"from_pretrained":
                               staticmethod(lambda *a, **k: obj)})

    monkeypatch.setattr(transformers, "OwlViTProcessor",
                        fp(_FakeOwlProcessor()))
    monkeypatch.setattr(transformers, "OwlViTForObjectDetection",
                        fp(_FakeModel()))
    monkeypatch.setattr(transformers, "AutoProcessor",
                        fp(_FakeSamProcessor()))
    monkeypatch.setattr(transformers, "SamModel", fp(_FakeModel(_Out())))


def test_backend_box_mask_pos_plumbing(fake_transformers):
    """256x256 frame with a red 'gripper' blob: the backend must select the
    highest-score box, return the SAM mask for it, and GripperLocator must
    rescale mask_to_pos_naive's (x+10, y-10) answer by 224/256."""
    img = np.zeros((256, 256, 3), np.uint8) + 120   # mid-gray background
    img[100:120, 140:170, 0] = 255                  # red blob
    img[100:120, 140:170, 1:] = 0

    backend = HFDetectorBackend()
    mask = backend(img)
    assert mask.shape == (256, 256) and mask.dtype == bool
    assert mask[110, 150] and not mask[0, 0]

    x, y = GripperLocator(backend=backend)(img)
    # bottom-right-most mask pixel (169, 119) + offsets (10, -10) -> 224/256
    assert (x, y) == (round(179 * 224 / 256), round(109 * 224 / 256))


def test_backend_no_detection_falls_back(fake_transformers):
    """No red blob -> OWL returns zero boxes -> backend returns None and
    the locator must fall back to the darkest-region heuristic, never
    raise (reference behavior: loop keeps running without a detector)."""
    img = np.full((128, 128, 3), 200, np.uint8)
    img[60:64, 60:64] = 0                           # dark gripper-ish patch
    backend = HFDetectorBackend()
    assert backend(img) is None
    x, y = GripperLocator(backend=backend, model_size=224)(img)
    assert (x, y) == (round(73 * 224 / 128), round(53 * 224 / 128))
