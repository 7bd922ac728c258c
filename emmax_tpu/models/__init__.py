"""Model definitions (vision towers, LLM decoder, projector, VLM/VLA)."""

from emmax_tpu.models.llama import (LLAMA2_7B, LLAMA2_13B, MISTRAL_7B,
                                    LlamaConfig, init_kv_cache,
                                    init_llama_params, llama_forward)
from emmax_tpu.models.phi import PHI_2, PhiConfig, init_phi_params, phi_forward
from emmax_tpu.models.vit import (CLIP_L, DINOV2_L_REG4, SIGLIP_SO400M,
                                  ViTConfig, init_vit_params, vit_forward)
from emmax_tpu.models.vlm import (VLMConfig, emma_x_vlm_config,
                                  init_vlm_params, tiny_vlm_config,
                                  vlm_forward)

__all__ = [
    "LlamaConfig", "PhiConfig", "ViTConfig", "VLMConfig",
    "LLAMA2_7B", "LLAMA2_13B", "MISTRAL_7B", "PHI_2",
    "CLIP_L", "DINOV2_L_REG4", "SIGLIP_SO400M",
    "init_llama_params", "init_phi_params", "init_vit_params",
    "init_vlm_params", "init_kv_cache",
    "llama_forward", "phi_forward", "vit_forward", "vlm_forward",
    "emma_x_vlm_config", "tiny_vlm_config",
]
