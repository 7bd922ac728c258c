"""Model ID registry (descriptive metadata for every pretrained model id).

Counterpart of ``/root/reference/prismatic/models/registry.py:9-691``.
Populated as model families land; keys mirror the reference registry.
"""

from __future__ import annotations

from typing import Dict

MODEL_REGISTRY: Dict[str, dict] = {}
