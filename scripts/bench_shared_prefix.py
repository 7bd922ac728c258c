"""Shared-prefix admission breakdown on the real chip (VERDICT r4 item 10).

bench.py's end-to-end rows measured shared 4-way admission at only 1.24x
independent (198.3 vs 246.1 ms, BENCH_r04.json) despite the ViTs + ~80% of
prefill positions running once instead of four times. This script times the
PIECES so the shortfall is attributable:

  vit_ms          one ViT-tower encode (the compute shared admission saves 3x)
  prefix_ms       submit_shared's one-time BOS+patch prefill (G=1, ~559 pos)
  tails_ms        the batched 4-tail prefill (G=4, ~130 pos each)
  indep_ms        one batched 4-way full prefill (G=4, ~690 pos each)
  shared_ms       prefix_ms-call + tails_ms-call end to end (bench.py row)

Hypothesis space: (a) a G=1 559-position prefill underutilizes the chip so
it costs nearly as much as the G=4 690-position one (MXU likes batch); (b)
pool scatter writes dominate and scale with pool size, not tokens; (c) the
two sequential device calls serialize what independent admission overlaps.

    python scripts/bench_shared_prefix.py
One TPU process at a time.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from emmax_tpu.models.vlm import emma_x_vlm_config, init_vlm_params
    from emmax_tpu.ops.image import (dinosiglip_transform_configs,
                                     preprocess_for_towers)
    from emmax_tpu.serving.engine import encode_frame
    from emmax_tpu.serving.paged import PagedServingEngine
    from emmax_tpu.serving.quant import quantize_vlm_params
    from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

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
    out = {"bench": "shared_prefix_breakdown",
           "num_patches": cfg.num_patches}

    def timed(fn, reps=3):
        fn()                                   # warmup/compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3

    # --- the ViT encode alone (what shared admission runs 1x instead of 4x)
    out["vit_ms"] = round(timed(lambda: np.asarray(
        encode_frame(q4params, cfg, pixels, attn_impl="xla"))), 1)

    def fresh(num_slots=4):
        return PagedServingEngine(cfg, q4params, tok, num_slots=num_slots,
                                  n_pages=34, page_size=128,
                                  max_pages_per_slot=8, burst=64,
                                  quantized_cache=True)

    qs = [prompt[:-1] + s for s in ("A", "B", "C", "D")]

    # --- shared path, split: submit_shared (prefix prefill) vs _admit (tails)
    def shared_split():
        eng = fresh()
        t0 = time.perf_counter()
        eng.submit_shared(qs, pixels, max_new_tokens=8)
        jax.block_until_ready(eng.pool["k"])
        t1 = time.perf_counter()
        eng._admit()
        jax.block_until_ready(eng.pool["k"])
        t2 = time.perf_counter()
        return (t1 - t0) * 1e3, (t2 - t1) * 1e3

    shared_split()                             # warmup/compile both pieces
    pre, tails = zip(*[shared_split() for _ in range(3)])
    out["prefix_ms"] = round(float(np.median(pre)), 1)
    out["tails_ms"] = round(float(np.median(tails)), 1)
    out["shared_ms"] = round(out["prefix_ms"] + out["tails_ms"], 1)

    # --- independent path: one batched 4-way full prefill
    def indep():
        eng = fresh()
        t0 = time.perf_counter()
        for q in qs:
            eng.submit(q, pixels, max_new_tokens=8)
        eng._admit()
        jax.block_until_ready(eng.pool["k"])
        return (time.perf_counter() - t0) * 1e3

    indep()                                    # warmup/compile
    out["indep_ms"] = round(float(np.median([indep() for _ in range(3)])), 1)
    out["shared_speedup_x"] = round(out["indep_ms"] / out["shared_ms"], 2)

    # --- G=1 full prefill (is a single-row prefill disproportionately
    # expensive? MXU utilization at batch 1 vs 4)
    def indep1():
        eng = fresh(num_slots=1)
        t0 = time.perf_counter()
        eng.submit(qs[0], pixels, max_new_tokens=8)
        eng._admit()
        jax.block_until_ready(eng.pool["k"])
        return (time.perf_counter() - t0) * 1e3

    indep1()
    out["indep1_ms"] = round(float(np.median([indep1() for _ in range(3)])),
                             1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
