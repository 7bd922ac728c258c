"""Descriptive model registry.

Counterpart of ``/root/reference/prismatic/models/registry.py:9-691``:
metadata for every loadable model id (description, backbone composition,
expected artifact source). Entries are generated from the config registries
rather than hand-written per id.
"""

from __future__ import annotations

from typing import Dict


def _build() -> Dict[str, dict]:
    from emmax_tpu.conf.models import _MODELS, ModelConfig
    from emmax_tpu.conf.vla import EXPERIMENTS, VLAConfig

    registry: Dict[str, dict] = {}
    for mid in list(_MODELS) + ["prism-dinosiglip-224px+7b"]:
        mc = ModelConfig.get_choice_class(mid)()
        registry[mid] = {
            "kind": "vlm",
            "description": (f"Prismatic VLM: {mc.vision_backbone_id} + "
                            f"{mc.llm_backbone_id} ({mc.arch_specifier}, "
                            f"{mc.image_resize_strategy})"),
            "vision_backbone_id": mc.vision_backbone_id,
            "llm_backbone_id": mc.llm_backbone_id,
            "arch_specifier": mc.arch_specifier,
            "image_resize_strategy": mc.image_resize_strategy,
        }
    for vid in EXPERIMENTS:
        vc = VLAConfig.get_choice_class(vid)()
        registry[vid] = {
            "kind": "vla",
            "description": (f"Emma-X/OpenVLA policy on base VLM "
                            f"{vc.base_vlm}, data mix {vc.data_mix}"),
            "base_vlm": str(vc.base_vlm),
            "data_mix": vc.data_mix,
        }
    return registry


MODEL_REGISTRY: Dict[str, dict] = _build()
GLOBAL_REGISTRY = MODEL_REGISTRY  # reference exposes both names
