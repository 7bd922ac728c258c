"""Closed-loop draft_k sweep on the real chip (round 4).

The int4 kernel's wide-bn decode regime now covers verify chunks up to 48
rows (``ops/int4_matmul.py:_bm_for``), so draft_k > 15 no longer falls
off the fast tiling — the k16/k20 losses measured in round 3 (27.2/28.6
vs 30.8 warm Hz) were the bm=128/bn=512 cliff, not draft quality. The
offline simulator (scripts/sim_spec_drafts.py, step counts pinned to the
engine by tests/test_spec_simulator.py) predicts warm steps 13 -> 10 -> 8
for k = 12 -> 24 -> 43 on bench.py's exact GCOT streams; chunk cost is
weight-traffic-bound, so fewer steps should convert ~1:1 into Hz.

Runs bench.py's closed-loop episode (vision cache, prefix_tail=24, int8
KV, tree (7,5), teacher-forced streams) per k and reports warm/cold
frame ms + steps. One TPU process at a time.

    python scripts/bench_spec_k.py [--ks 12,24,43]
"""

from __future__ import annotations

import argparse
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

ACTIONS_PER_DECODE = 8
FRAMES = 12
TYPICAL_TOKENS = 96


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="12,24,43")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from emmax_tpu.models.vlm import emma_x_vlm_config, init_vlm_params
    from emmax_tpu.ops.image import (dinosiglip_transform_configs,
                                     preprocess_for_towers)
    from emmax_tpu.serving.engine import GenerateOptions, VisionCache
    from emmax_tpu.serving.quant import quantize_vlm_params
    from emmax_tpu.serving.speculative import SpeculativeEngine
    from emmax_tpu.vla.action_tokenizer import ActionTokenizer
    from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

    cfg = emma_x_vlm_config()
    shapes = jax.eval_shape(
        lambda: init_vlm_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16))
    q4_shapes = jax.eval_shape(
        lambda p: quantize_vlm_params(p, bits=4), shapes)
    q4params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), q4_shapes)
    tok = ByteLevelTokenizer()
    atok = ActionTokenizer(tok)
    opts = GenerateOptions(eos_id=tok.eos_id)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(1, 256, 256, 3), dtype=np.uint8)
    pixels = preprocess_for_towers(jnp.asarray(img),
                                   dinosiglip_transform_configs())
    pixels = {k: v.astype(jnp.bfloat16) for k, v in pixels.items()}

    # --- bench.py's closed-loop streams, byte for byte
    rng_a = np.random.default_rng(1)
    base_action = rng_a.uniform(-0.4, 0.4, size=7)
    rollout = [np.clip(base_action + rng_a.normal(scale=0.02, size=7),
                       -1, 1) for _ in range(ACTIONS_PER_DECODE + FRAMES)]

    def frame_stream(f, n_tokens):
        text = ("REASONING: the gripper must reach the eggplant before "
                "grasping it\nSUBTASK: move the gripper to the eggplant"
                f"\nNEXT GRIPPER: [{112 + 2 * f}, {96 + f}]\nMOVEMENT:\n"
                f"move forward {21 - f} steps; move left 3 steps; close "
                "gripper;\nPOLICIES: ")
        ids = tok.encode(text)[:n_tokens - ACTIONS_PER_DECODE * 7]
        for a in rollout[f:f + ACTIONS_PER_DECODE]:
            ids.extend(int(t) for t in atok.encode_to_ids(a))
        return ids[:n_tokens]

    seed_template = tok.encode(
        "REASONING: the gripper must \nSUBTASK: move the gripper to "
        "the \nNEXT GRIPPER: [1, 1]\nMOVEMENT:\nmove forward 1 steps; "
        "move left 1 steps; close gripper;\nPOLICIES: "
        "REASONING: the gripper must reach the \nSUBTASK: move the "
        "gripper to the \nNEXT GRIPPER: [10, 10]\nMOVEMENT:\nmove "
        "backward 2 steps; move right 2 steps; open gripper;\nPOLICIES: "
        "REASONING: the gripper must reach the eggplant \nSUBTASK: "
        "grasp the eggplant\nNEXT GRIPPER: [12, 9]\nMOVEMENT:\nmove "
        "down 3 steps; close gripper;\nPOLICIES: ",
        add_special_tokens=False)

    noisy = [{k: v + 0.001 * f for k, v in pixels.items()}
             for f in range(FRAMES)]
    host_frames = [np.clip(img[0].astype(np.int32) + f, 0, 255)
                   .astype(np.uint8) for f in range(FRAMES)]

    def frame_prompt(f):
        return ("In: What action should the robot take to achieve the "
                "instruction\nINSTRUCTION: \nPut the eggplant in the "
                "pot\nCURRENT GRIPPER: "
                f"[{104 + 2 * f:03d}, {98 + f:03d}]\nOut:")

    streams = [frame_stream(f, TYPICAL_TOKENS) for f in range(FRAMES)]

    def episode(engine):
        prev = np.asarray(seed_template, np.int32)
        steps, ts = [], []
        for f in range(FRAMES):
            t0 = time.perf_counter()
            out = engine.generate_ids([frame_prompt(f)], noisy[f],
                                      max_new_tokens=TYPICAL_TOKENS,
                                      forced_tokens=streams[f],
                                      draft_context=prev,
                                      frame_key=host_frames[f])
            np.asarray(out)                    # force the fetch
            ts.append(time.perf_counter() - t0)
            prev = out[0]
            steps.append(engine.last_steps)
        return ts, steps

    out = {"bench": "spec_k_sweep", "frames": FRAMES,
           "tokens": TYPICAL_TOKENS}
    for k in (int(v) for v in args.ks.split(",")):
        vc = VisionCache(capacity=4, threshold=0.05)
        eng = SpeculativeEngine(cfg, q4params, tok, options=opts,
                                draft_k=k, vision_cache=vc,
                                prefix_tail=24, quantized_cache=True,
                                action_tree=(7, 5))
        episode(eng)                           # warmup/compile
        best_ts, best_steps = None, None
        for _ in range(2):
            ts, steps = episode(eng)
            if best_ts is None or sum(ts) < sum(best_ts):
                best_ts, best_steps = ts, steps
        warm = float(np.median(best_ts[1:]))
        out[f"k{k}_frame_ms"] = round(sum(best_ts) / FRAMES * 1e3, 1)
        out[f"k{k}_warm_ms"] = round(warm * 1e3, 1)
        out[f"k{k}_warm_hz"] = round(ACTIONS_PER_DECODE / warm, 2)
        out[f"k{k}_cold_ms"] = round(best_ts[0] * 1e3, 1)
        out[f"k{k}_steps"] = best_steps
        print(json.dumps(out), flush=True)
        del eng
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
