"""Quantization quality gate at 7B scale on the real TPU.

VERDICT r2 item 4 (the bitsandbytes-verification role of
``/root/reference/vla-scripts/extern/verify_openvla.py:31-60``): with
IDENTICAL deterministic random weights, compare int8 and int4 (group sizes
64/128/256) against bf16 on:

- teacher-forced argmax agreement over >=512 positions (512 independent
  next-token predictions from one prefill — stronger than free-run
  agreement, which collapses onto loops for random weights),
- free-run greedy token agreement over 512 decode steps,
- last-position logit RMSE / max-abs error.

Weights are generated leaf-by-leaf from per-path folded PRNG keys so every
quantization run sees the same values WITHOUT ever holding the full bf16
tree next to a quantized copy (bf16 7B ~= 13.5 GB; peak here is the
quantized tree + one bf16 leaf). Usage:

    python scripts/bench_quant_quality.py [--formats bf16,int8,int4g128]
    # each run prints one JSON line per format; compare with --ref ref.npz
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import zlib
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def leaf_key(path_str: str, base: int = 0):
    import jax

    return jax.random.fold_in(jax.random.PRNGKey(base),
                              zlib.crc32(path_str.encode()) & 0x7FFFFFFF)


def generate_leaf(path_str: str, shape, dtype):
    """Deterministic value for a param leaf: normals scaled llama-style for
    matmul weights, ones for norms/scales, zeros for biases."""
    import jax
    import jax.numpy as jnp

    name = path_str.rsplit("/", 1)[-1]
    if "norm" in name or name in ("ls1", "ls2", "scale_factor"):
        return jnp.ones(shape, dtype)
    if "bias" in name:
        return jnp.zeros(shape, dtype)
    k = leaf_key(path_str)
    fan_in = shape[-2] if len(shape) >= 2 else shape[-1]
    std = float(1.0 / np.sqrt(max(fan_in, 1)))
    return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)


def build_params(fmt: str):
    """fmt: bf16 | int8 | int4g{64,128,256}. One jitted call generates the
    whole deterministic tree and (for quant formats) quantizes the LLM
    matmul leaves in place — XLA frees each bf16 leaf after its quantize,
    so peak memory is quantized-tree + one leaf. A single compile instead
    of one dispatch/compile per leaf (the relay charges minutes for the
    per-leaf version)."""
    import jax
    import jax.numpy as jnp

    from emmax_tpu.models.vlm import emma_x_vlm_config, init_vlm_params
    from emmax_tpu.serving.quant import quantize_weight
    from emmax_tpu.ops.int4_matmul import quantize_weight_int4

    cfg = emma_x_vlm_config()
    shapes = jax.eval_shape(
        lambda: init_vlm_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16))
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    paths = ["/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                      for k in path) for path, _ in flat]

    def is_llm_mm(ps):
        return ps.startswith("llm/") and any(
            ps.endswith("/" + q) or ps == "llm/" + q for q in
            ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down", "lm_head"))

    def quantize(val):
        if fmt == "int8":
            return quantize_weight(val)
        group = int(fmt[len("int4g"):])
        return quantize_weight_int4(val, group=group)

    # One jit for everything that stays bf16; one jit PER quantized leaf so
    # XLA frees each bf16 source right after its quantize (a single fused
    # jit kept all bf16 intermediates live -> 16.1 GB OOM at int4).
    plain_idx = [i for i, ps in enumerate(paths)
                 if fmt == "bf16" or not is_llm_mm(ps)]
    quant_idx = [i for i in range(len(paths)) if i not in set(plain_idx)]

    plain_vals = jax.jit(lambda: [
        generate_leaf(paths[i], flat[i][1].shape, flat[i][1].dtype)
        for i in plain_idx])()
    jax.block_until_ready(plain_vals)

    out = [None] * len(paths)
    for i, v in zip(plain_idx, plain_vals):
        out[i] = v
    for i in quant_idx:
        qv = jax.jit(lambda i=i: quantize(generate_leaf(
            paths[i], flat[i][1].shape, flat[i][1].dtype)))()
        jax.block_until_ready(qv)
        out[i] = qv
    return cfg, jax.tree_util.tree_unflatten(treedef, out)


def run_format(fmt: str, n_forced: int = 512, n_free: int = 512):
    import jax
    import jax.numpy as jnp

    from emmax_tpu.models.vlm import vlm_forward
    from emmax_tpu.ops.image import (dinosiglip_transform_configs,
                                     preprocess_for_towers)
    from emmax_tpu.serving.engine import GenerateOptions, ServingEngine
    from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

    t0 = time.time()
    cfg, params = build_params(fmt)
    tok = ByteLevelTokenizer()
    prompt = ("In: What action should the robot take to achieve the "
              "instruction\nINSTRUCTION: \nPut the eggplant in the pot\n"
              "CURRENT GRIPPER: [104, 98]\nOut:")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(1, 256, 256, 3), dtype=np.uint8)
    pixels = preprocess_for_towers(jnp.asarray(img),
                                   dinosiglip_transform_configs())
    pixels = {k: v.astype(jnp.bfloat16) for k, v in pixels.items()}

    # --- teacher-forced: one prefill over prompt + n_forced random tokens;
    # argmax + last-logit slice at every forced position
    forced = rng.integers(300, 30000, size=n_forced, dtype=np.int32)
    ids = np.asarray([tok.encode(prompt) + list(forced)], np.int32)

    @jax.jit
    def tf_forward(params, ids):
        logits, _, _ = vlm_forward(params, cfg, ids, pixels,
                                   mask=jnp.ones(ids.shape, jnp.bool_))
        return logits[0, -n_forced:].astype(jnp.float32)

    tf_logits = np.asarray(tf_forward(params, jnp.asarray(ids)))
    tf_argmax = tf_logits.argmax(-1).astype(np.int32)

    # --- free-run greedy decode
    eng = ServingEngine(cfg, params, tok,
                        options=GenerateOptions(eos_id=-1))
    free = np.asarray(eng.generate_ids([prompt], pixels,
                                       max_new_tokens=n_free))[0]

    out = {
        "format": fmt,
        "tf_argmax": tf_argmax.tolist(),
        "free_tokens": free.tolist(),
        "last_logits": tf_logits[-1].tolist(),
        "build_plus_run_s": round(time.time() - t0, 1),
    }
    return out


def compare(ref: dict, test: dict) -> dict:
    ref_tf = np.asarray(ref["tf_argmax"])
    t_tf = np.asarray(test["tf_argmax"])
    ref_free = np.asarray(ref["free_tokens"])
    t_free = np.asarray(test["free_tokens"])
    ref_ll = np.asarray(ref["last_logits"], np.float64)
    t_ll = np.asarray(test["last_logits"], np.float64)
    n = min(len(ref_free), len(t_free))
    return {
        "format": test["format"],
        "tf_agree_pct": round(100.0 * (ref_tf == t_tf).mean(), 2),
        "tf_positions": int(len(ref_tf)),
        "free_agree_pct": round(
            100.0 * (ref_free[:n] == t_free[:n]).mean(), 2),
        "free_first_divergence": int(
            np.argmax(ref_free[:n] != t_free[:n])
            if (ref_free[:n] != t_free[:n]).any() else -1),
        "last_logit_rmse": float(np.sqrt(np.mean((ref_ll - t_ll) ** 2))),
        "last_logit_max_abs": float(np.max(np.abs(ref_ll - t_ll))),
        "last_logit_scale_rms": float(np.sqrt(np.mean(ref_ll ** 2))),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--format", required=True,
                    help="bf16 | int8 | int4g64 | int4g128 | int4g256")
    ap.add_argument("--out", required=True)
    ap.add_argument("--ref", default=None,
                    help="bf16 .json to compare against (prints metrics)")
    args = ap.parse_args()
    res = run_format(args.format)
    Path(args.out).write_text(json.dumps(res))
    if args.ref:
        ref = json.loads(Path(args.ref).read_text())
        print(json.dumps(compare(ref, res)))
    else:
        print(json.dumps({"format": res["format"],
                          "saved": args.out,
                          "build_plus_run_s": res["build_plus_run_s"]}))


if __name__ == "__main__":
    main()
