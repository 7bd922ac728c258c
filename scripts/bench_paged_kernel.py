"""Paged-attention KERNEL vs burstdense: find the crossover (or prove none).

Round-3 measured the upstream Pallas paged-attention kernel 18x slower
than burstdense at the bench workload (6 slots, ~64-token KV): 32 layers x
burst separate tiny-grid invocations are DMA-setup-bound. Its hypothetical
regime is LONG KV with many pages, where burstdense's per-burst dense
gather re-reads ``slots x max_len`` K/V every burst while the kernel
streams pages once per decode step. This sweeps KV length at fixed slot
count and reports per-burst decode time for both paths (prefill excluded —
admission happens in the first ``step()``; only subsequent bursts are
timed).

VERDICT r3 weak #4 / next-round item 6: keep the kernel only with a
measured crossover, otherwise delete it.

    python scripts/bench_paged_kernel.py [--kv_lens 512,1024,2048]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kv_lens", default="512,1024,2048")
    ap.add_argument("--slots", type=int, default=6)
    ap.add_argument("--burst", type=int, default=64)
    ap.add_argument("--decode_bursts", type=int, default=3,
                    help="timed bursts per variant (after the admission "
                         "burst)")
    ap.add_argument("--variants", default="burstdense,kernel")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from emmax_tpu.models.vlm import emma_x_vlm_config, init_vlm_params
    from emmax_tpu.ops.image import (dinosiglip_transform_configs,
                                     preprocess_for_towers)
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
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(1, 256, 256, 3), dtype=np.uint8)
    pixels = preprocess_for_towers(jnp.asarray(img),
                                   dinosiglip_transform_configs())
    pixels = {k: v.astype(jnp.bfloat16) for k, v in pixels.items()}

    out = {"bench": "paged_kernel_crossover", "slots": args.slots,
           "burst": args.burst}
    for kv_len in (int(v) for v in args.kv_lens.split(",")):
        # prompt sized so prefix (1 + patches + text) ~= kv_len tokens
        text_len = max(kv_len - 1 - cfg.num_patches, 16)
        prompt = ("In: " + "move the gripper to the eggplant and back; "
                  * (text_len // 43 + 1))[:text_len]
        n_new = args.burst * (args.decode_bursts + 1)
        page_size = 128
        per_slot = -(-(kv_len + n_new + 8) // page_size) + 1
        for variant in args.variants.split(","):
            eng = PagedServingEngine(
                cfg, q4params, tok, num_slots=args.slots,
                n_pages=args.slots * per_slot + 2, page_size=page_size,
                max_pages_per_slot=per_slot + 1, burst=args.burst,
                paged_attn=variant, quantized_cache=(variant != "kernel"))
            for _ in range(args.slots):
                eng.submit(prompt, pixels, max_new_tokens=n_new)
            t0 = time.perf_counter()
            eng.step()                       # admission + first burst
            t_admit = time.perf_counter() - t0
            ts = []
            for _ in range(args.decode_bursts):
                t0 = time.perf_counter()
                eng.step()
                ts.append(time.perf_counter() - t0)
            t_burst = float(np.median(ts))
            key = f"{variant}_kv{kv_len}"
            out[key + "_burst_ms"] = round(t_burst * 1e3, 1)
            out[key + "_agg_tok_s"] = round(
                args.slots * args.burst / t_burst, 1)
            out[key + "_admit_s"] = round(t_admit, 2)
            del eng
            print(json.dumps(out), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
