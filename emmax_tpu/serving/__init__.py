from emmax_tpu.serving.engine import GenerateOptions, ServingEngine
from emmax_tpu.serving.speculative import SpeculativeEngine

__all__ = ["ServingEngine", "GenerateOptions", "SpeculativeEngine"]
