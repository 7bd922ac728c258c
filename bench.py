"""Benchmark: Emma-X 7B greedy decode on the attached TPU chip.

Measures the latency-critical serving path from SURVEY.md §3.2
(``generate_actions``): multimodal prefill (2 ViT towers + projector +
Llama-2-7B over ~320 fused tokens) + N greedy decode steps with KV cache,
all inside one jitted on-device loop.

Prints ONE JSON line:
  metric  amortized frame→action rate (Hz) for a 128-token GCOT decode whose
          POLICIES section carries 8 x 7-DoF actions (the reference executes
          the whole chunk per decode, run_bridgev2_eval.py:183-199)
  vs_baseline  value / 30 Hz (the BASELINE.md north-star target on v5e-4;
          single-chip here)
"""

import json
import os
import time

os.environ.setdefault("EMMAX_LOG_LEVEL", "WARNING")

import jax
import jax.numpy as jnp
import numpy as np

DECODE_TOKENS = 128
ACTIONS_PER_DECODE = 8  # typical POLICIES chunk (8 policies x 7 DoF)
PROMPT_LEN_BUCKET = 64


def main():
    from emmax_tpu.models.vlm import emma_x_vlm_config, init_vlm_params
    from emmax_tpu.serving.engine import GenerateOptions, ServingEngine
    from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

    cfg = emma_x_vlm_config()
    shapes = jax.eval_shape(
        lambda: init_vlm_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    n_params = sum(int(np.prod(s.shape))
                   for s in jax.tree_util.tree_leaves(shapes))

    tok = ByteLevelTokenizer()
    # never-EOS greedy with zero weights → deterministic full-length decode
    engine = ServingEngine(cfg, params, tok,
                           options=GenerateOptions(eos_id=tok.eos_id))
    prompt = ("In: What action should the robot take to achieve the "
              "instruction\nINSTRUCTION: \nPut the eggplant in the pot\n"
              "CURRENT GRIPPER: [104, 98]\nOut:")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(1, 256, 256, 3), dtype=np.uint8)
    from emmax_tpu.ops.image import preprocess_for_towers, \
        dinosiglip_transform_configs

    pixels = preprocess_for_towers(jnp.asarray(img),
                                   dinosiglip_transform_configs())
    pixels = {k: v.astype(jnp.bfloat16) for k, v in pixels.items()}

    # warmup/compile
    out = engine.generate_ids([prompt], pixels, max_new_tokens=DECODE_TOKENS)
    jax.block_until_ready(out)

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = engine.generate_ids([prompt], pixels,
                                  max_new_tokens=DECODE_TOKENS)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    tok_s = DECODE_TOKENS / t
    hz = ACTIONS_PER_DECODE / t

    print(json.dumps({
        "metric": "emma_x_7b_amortized_frame_to_action_hz",
        "value": round(hz, 3),
        "unit": "Hz",
        "vs_baseline": round(hz / 30.0, 4),
        "decode_tokens_per_sec": round(tok_s, 1),
        "total_s_per_frame": round(t, 4),
        "decode_tokens": DECODE_TOKENS,
        "params_b": round(n_params / 1e9, 3),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
