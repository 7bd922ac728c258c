"""Measure prompt-lookup speculative decoding at 7B scale on the TPU.

An all-zeros 7B model decodes a constant token, so lookup reaches full
acceptance after the first couple of steps — every verifier forward still
streams the full weight set through HBM, so the per-chunk-step time is the
real cost. From it:
  best-case  tok/s = (k+1) / chunk_step_s   (every draft accepted)
  worst-case tok/s = 1 / chunk_step_s       (every draft rejected)
against the plain engine's 1 / per_token_s. Prints one JSON line.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from emmax_tpu.models.vlm import emma_x_vlm_config, init_vlm_params
from emmax_tpu.ops.image import (dinosiglip_transform_configs,
                                 preprocess_for_towers)
from emmax_tpu.serving.engine import GenerateOptions, ServingEngine
from emmax_tpu.serving.speculative import SpeculativeEngine
from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

K = 8
N_LONG, N_SHORT = 128, 8


def measure(engine, prompt, pixels, n):
    out = engine.generate_ids([prompt], pixels, max_new_tokens=n)
    jax.block_until_ready(np.asarray(out))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = engine.generate_ids([prompt], pixels, max_new_tokens=n)
        np.asarray(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    from emmax_tpu.serving.quant import quantize_vlm_params

    cfg = emma_x_vlm_config()
    shapes = jax.eval_shape(
        lambda: init_vlm_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16))
    # int8 weight-only (the fastest single-chip config): bf16 7B + the
    # layout-transposed wq/wk/wv copies XLA makes for the chunked dot would
    # exceed single-chip HBM (weights shard across chips in deployment)
    q_shapes = jax.eval_shape(quantize_vlm_params, shapes)
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), q_shapes)
    tok = ByteLevelTokenizer()
    prompt = ("In: What action should the robot take to achieve the "
              "instruction\nINSTRUCTION: \nPut the eggplant in the pot\n"
              "CURRENT GRIPPER: [104, 98]\nOut:")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(1, 256, 256, 3), dtype=np.uint8)
    pixels = preprocess_for_towers(jnp.asarray(img),
                                   dinosiglip_transform_configs())
    pixels = {k: v.astype(jnp.bfloat16) for k, v in pixels.items()}
    opts = GenerateOptions(eos_id=tok.eos_id)

    plain = ServingEngine(cfg, params, tok, options=opts)
    tp_long = measure(plain, prompt, pixels, N_LONG)
    tp_short = measure(plain, prompt, pixels, 16)
    per_tok = (tp_long - tp_short) / (N_LONG - 16)

    spec = SpeculativeEngine(cfg, params, tok, options=opts, draft_k=K)
    ts_long = measure(spec, prompt, pixels, N_LONG)
    steps_long = spec.last_steps
    ts_short = measure(spec, prompt, pixels, N_SHORT)
    steps_short = spec.last_steps
    per_step = (ts_long - ts_short) / max(steps_long - steps_short, 1)

    print(json.dumps({
        "metric": "speculative_chunk_step_ms",
        "value": round(per_step * 1e3, 2),
        "unit": "ms",
        "k": K,
        "plain_decode_tok_s": round(1.0 / per_tok, 1),
        "spec_best_tok_s": round((K + 1) / per_step, 1),
        "spec_worst_tok_s": round(1.0 / per_step, 1),
        "chunk_overhead_x": round(per_step / per_tok, 3),
        "steps_for_128_tok": steps_long,
        "measured_accept_tok_per_step": round(N_LONG / steps_long, 2),
        "spec_128tok_total_s": round(ts_long, 3),
        "plain_128tok_total_s": round(tp_long, 3),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
