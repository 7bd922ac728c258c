from emmax_tpu.serving.engine import GenerateOptions, ServingEngine

__all__ = ["ServingEngine", "GenerateOptions"]
