"""emmax_tpu — TPU-native (JAX/XLA/Pallas) rebuild of Emma-X.

Public API mirrors the reference (``/root/reference/prismatic/__init__.py``):
``load`` (VLM) and ``load_vla`` (VLA) plus the conf/vla/model subpackages.
"""

__version__ = "0.1.0"


def load(*args, **kwargs):
    from emmax_tpu.models.load import load as _load

    return _load(*args, **kwargs)


def load_vla(*args, **kwargs):
    from emmax_tpu.models.load import load_vla as _load_vla

    return _load_vla(*args, **kwargs)


def available_models():
    from emmax_tpu.models.registry import MODEL_REGISTRY

    return sorted(MODEL_REGISTRY)
