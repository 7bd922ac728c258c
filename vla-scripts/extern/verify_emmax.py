"""Load-and-drive verification of an Emma-X run dir.

Counterpart of ``/root/reference/vla-scripts/extern/verify_openvla.py:23-60``:
loads a checkpoint through the public API and runs ``predict_action`` +
``generate_actions`` on a test frame, printing outputs for inspection, in
bf16 and fp32 (the reference also checks 8/4-bit quantized paths, which are
CUDA-bitsandbytes specific).

Usage:
  python vla-scripts/extern/verify_emmax.py --checkpoint runs/<run>
  python vla-scripts/extern/verify_emmax.py --smoke_test true
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from emmax_tpu.conf import parse_config
from emmax_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch("verify")


@dataclass
class VerifyConfig:
    checkpoint: Optional[Path] = None
    tokenizer_path: Optional[str] = None
    instruction: str = "put the spoon on the towel"
    max_new_tokens: int = 128
    smoke_test: bool = False


def main(cfg: VerifyConfig) -> None:
    import jax
    import jax.numpy as jnp

    if cfg.smoke_test:
        from emmax_tpu.models.vla import EmmaXVLA
        from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
        from emmax_tpu.ops.image import ImageTransformConfig
        from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

        vcfg = tiny_vlm_config(512)
        variants = {"fp32": EmmaXVLA(
            vcfg, init_vlm_params(jax.random.PRNGKey(0), vcfg),
            ByteLevelTokenizer(512),
            {n: ImageTransformConfig(size=v.img_size)
             for n, v in vcfg.vision})}
        cfg.max_new_tokens = 12
    else:
        from emmax_tpu.models.load import load_vla

        variants = {
            "bf16": load_vla(cfg.checkpoint, dtype=jnp.bfloat16,
                             tokenizer_path=cfg.tokenizer_path),
            "fp32": load_vla(cfg.checkpoint, dtype=jnp.float32,
                             tokenizer_path=cfg.tokenizer_path),
        }

    frame = np.random.default_rng(0).integers(0, 256, (256, 256, 3),
                                              dtype=np.uint8)
    for name, vla in variants.items():
        t0 = time.time()
        prompt = vla.get_prompt(cfg.instruction, gripper_position=(112, 112))
        actions, text = vla.generate_actions(
            frame, prompt, type="act", max_new_tokens=cfg.max_new_tokens)
        overwatch.info(f"[{name}] generate_actions -> {len(actions)} actions "
                       f"in {time.time() - t0:.1f}s")
        overwatch.info(f"[{name}] first action: {np.round(actions[0], 4)}")
        overwatch.info(f"[{name}] text[:120]: {text[:120]!r}")
        a = vla.predict_action(frame, cfg.instruction)
        overwatch.info(f"[{name}] predict_action: {np.round(a, 4)}")


if __name__ == "__main__":
    main(parse_config(VerifyConfig, sys.argv[1:]))
