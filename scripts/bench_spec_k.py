"""Closed-loop (draft_k x action_tree) sweep on the real chip (round 5).

Round 4 compiled ``action_tree=(7,5)`` into the closed loop untested and
the driver measured a 2x regression (the ``lax.cond`` tree branch broke
in-place KV-cache aliasing; VERDICT r4 item 1). Round 5 replaced the cond
with a unified W-wide step (``serving/speculative.py:_spec_decode_impl``).
This script is the on-chip gate BEFORE any tree/k default changes: per
config it reports warm/cold frame ms + steps of bench.py's exact
closed-loop episode, and (``--floor``) the pure per-verifier-step cost
from a random undraftable stream — the number that exploded 6.8 -> 73.6
ms in round 4 and must stay ~flat vs tree-off now.

    python scripts/bench_spec_k.py [--configs 12:off,12:on,24:off,43:off]
One TPU process at a time.
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
    ap.add_argument("--configs", default="12:off,12:on,24:off,43:off",
                    help="comma list of draft_k:TREE with TREE in "
                         "off | on/75 = tree (7,5) | 53 = tree (5,3)")
    ap.add_argument("--floor", action="store_true",
                    help="also measure pure step cost on a random stream")
    ap.add_argument("--group", type=int, default=0,
                    help="int4 quantization group size override (0 = the "
                         "serving default, 128). --group 64 measures the "
                         "quality-tilted weights' closed-loop Hz cost "
                         "(VERDICT r4 item 9): g64 doubles scale-row count "
                         "— scales are bf16 so +~0.22 GB of weight reads")
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
        lambda p: quantize_vlm_params(p, bits=4,
                                      group=args.group or None), shapes)
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

    # --- floor stream: random tokens, no draftable structure -> ~1 token
    # per verifier step; frame time / steps = pure per-step cost
    rng_f = np.random.default_rng(7)
    floor_streams = [rng_f.integers(300, 30000, size=TYPICAL_TOKENS * 2)
                     .astype(np.int32) for _ in range(3)]

    def floor_episode(engine):
        prev = np.asarray(seed_template, np.int32)
        ts, steps = [], []
        for f in range(3):
            t0 = time.perf_counter()
            out = engine.generate_ids([frame_prompt(f)], noisy[f],
                                      max_new_tokens=TYPICAL_TOKENS,
                                      forced_tokens=floor_streams[f],
                                      draft_context=prev,
                                      frame_key=host_frames[f])
            np.asarray(out)
            ts.append(time.perf_counter() - t0)
            prev = out[0]
            steps.append(engine.last_steps)
        return ts, steps

    out = {"bench": "spec_k_sweep", "frames": FRAMES,
           "tokens": TYPICAL_TOKENS, "int4_group": args.group or 128}
    trees = {"off": None, "on": (7, 5), "75": (7, 5), "53": (5, 3)}
    for spec in args.configs.split(","):
        kstr, _, tstr = spec.partition(":")
        k, tree = int(kstr), trees[tstr.strip() or "off"]
        tag = f"k{k}" + ("" if tree is None else
                         "t" + "".join(map(str, tree)))
        vc = VisionCache(capacity=4, threshold=0.05)
        eng = SpeculativeEngine(cfg, q4params, tok, options=opts,
                                draft_k=k, vision_cache=vc,
                                prefix_tail=24, quantized_cache=True,
                                action_tree=tree)
        episode(eng)                           # warmup/compile
        best_ts, best_steps = None, None
        for _ in range(2):
            ts, steps = episode(eng)
            if best_ts is None or sum(ts) < sum(best_ts):
                best_ts, best_steps = ts, steps
        warm = float(np.median(best_ts[1:]))
        out[f"{tag}_frame_ms"] = round(sum(best_ts) / FRAMES * 1e3, 1)
        out[f"{tag}_warm_ms"] = round(warm * 1e3, 1)
        out[f"{tag}_warm_hz"] = round(ACTIONS_PER_DECODE / warm, 2)
        out[f"{tag}_cold_ms"] = round(best_ts[0] * 1e3, 1)
        out[f"{tag}_steps"] = best_steps
        if args.floor:
            floor_episode(eng)                 # warmup the floor shapes
            fts, fsteps = floor_episode(eng)
            best_i = int(np.argmin(fts[1:])) + 1
            out[f"{tag}_floor_step_ms"] = round(
                fts[best_i] / max(fsteps[best_i], 1) * 1e3, 2)
            out[f"{tag}_floor_steps"] = fsteps[best_i]
        print(json.dumps(out), flush=True)
        del eng
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
