"""A/B the paged engine's burstdense write paths on the real chip.

Runs the bench.py paged workload (6 concurrent 7B int4 requests, int8
pages, burst=64) with the uniform-write fast path ON and OFF:

  ON   all slots enter each burst at the same length (host-checked), so
       new K/V rows land with ONE batched dynamic_update_slice per buffer
       per layer per step;
  OFF  the round-3 per-row fori_loop (B tiny DUS ops per buffer).

Reference workload shape: the reference has no serving stack at all
(HF ``generate``, batch=1, ``modeling_prismatic.py:326``); the comparison
target is our own dense one-shot batch (444.8 agg tok/s in round 3).

Usage: python scripts/bench_paged.py   (TPU; ~4 min incl. relay compiles)
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
from emmax_tpu.serving.paged import PagedServingEngine
from emmax_tpu.serving.quant import quantize_vlm_params
from emmax_tpu.vla.tokenizer import ByteLevelTokenizer


def main():
    cfg = emma_x_vlm_config()
    shapes = jax.eval_shape(
        lambda: init_vlm_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16))
    q4_shapes = jax.eval_shape(
        lambda p: quantize_vlm_params(p, bits=4), shapes)
    q4params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), q4_shapes)
    tok = ByteLevelTokenizer()
    prompt = ("In: What action should the robot take to achieve the "
              "instruction\nINSTRUCTION: \nPut the eggplant in the pot\n"
              "CURRENT GRIPPER: [104, 98]\nOut:")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(1, 256, 256, 3), dtype=np.uint8)
    pixels = preprocess_for_towers(jnp.asarray(img),
                                   dinosiglip_transform_configs())
    pixels = {k: v.astype(jnp.bfloat16) for k, v in pixels.items()}

    def run_paged(uniform):
        eng = PagedServingEngine(cfg, q4params, tok, num_slots=6,
                                 n_pages=34, page_size=128,
                                 max_pages_per_slot=6, burst=64,
                                 quantized_cache=True,
                                 uniform_burst_writes=uniform)
        for _ in range(6):
            eng.submit(prompt, pixels, max_new_tokens=64)
        t0 = time.perf_counter()
        done = eng.run_until_complete()
        return sum(len(v) for v in done.values()), time.perf_counter() - t0

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="uniform,per_row,dense",
                    help="comma list: uniform | per_row | dense")
    args = ap.parse_args()
    variants = args.variants.split(",")

    def run_dense(quantized_cache=False):
        # the dense one-shot comparator: same int4 weights, same 6 requests
        # decoded as ONE batch with per-request reserved cache (bf16 KV, or
        # int8 KV for the equal-cache-precision comparison)
        from emmax_tpu.serving.engine import GenerateOptions, ServingEngine

        eng = ServingEngine(cfg, q4params, tok,
                            options=GenerateOptions(eos_id=tok.eos_id),
                            quantized_cache=quantized_cache)
        imgs = {k: jnp.concatenate([v] * 6, axis=0) for k, v in pixels.items()}
        t0 = time.perf_counter()
        out = eng.generate_ids([prompt] * 6, imgs, max_new_tokens=64)
        out = np.asarray(out)                # forces the fetch
        dt = time.perf_counter() - t0
        # count actually-emitted (non-EOS-padding) tokens, mirroring the
        # paged path — with real weights an early EOS must not inflate
        # dense tok/s (random weights rarely emit EOS, so usually 6*64)
        toks = int((out != tok.eos_id).sum())
        return toks, dt

    out = {}
    for variant in variants:
        if variant.startswith("dense"):
            q8 = variant == "dense_int8kv"
            run_dense(q8)                        # warmup/compile
            toks, t = run_dense(q8)
        else:
            uniform = variant == "uniform"
            run_paged(uniform)                   # warmup/compile
            toks, t = run_paged(uniform)
        key = (f"{variant}_6req_agg_tok_s" if variant.startswith("dense")
               else f"paged_6req_agg_tok_s_{variant}")
        out[key] = round(toks / t, 1)
        out[f"t_{variant}_s"] = round(t, 3)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
