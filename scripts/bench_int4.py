"""Int4 batch-1 decode microbench (slope method, real TPU).

Measures the end metric of ops/int4_matmul.py — 7B greedy decode tok/s
through the ServingEngine ((t128 - t16)/112 removes prefill + fixed
costs). Run on the chip: `python scripts/bench_int4.py` (one TPU process
at a time). History: r2 int32-shift-pair unpack 138.6 tok/s; r3
biased-low-nibble unpack 153.6 tok/s (see docs/BENCHMARKS.md).
"""
import argparse, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from emmax_tpu.models.vlm import emma_x_vlm_config, init_vlm_params
from emmax_tpu.serving.quant import quantize_vlm_params
from emmax_tpu.serving.engine import GenerateOptions, ServingEngine
from emmax_tpu.vla.tokenizer import ByteLevelTokenizer
from emmax_tpu.ops.image import dinosiglip_transform_configs, preprocess_for_towers

ap = argparse.ArgumentParser()
ap.add_argument("--group", type=int, default=128,
                help="int4 quantization group size (g64 = quality-tilted, "
                     "g128 = throughput default; A/B per VERDICT r3 item 4)")
ap.add_argument("--scales", default="bf16", choices=["bf16", "f32", "both"],
                help="scale-row dtype A/B (VERDICT r4 item 5: decode "
                     "drifted 153.6 -> 146.8 tok/s after scales went bf16 "
                     "in round 4 — the kernel accepts either dtype, so "
                     "'both' measures them in ONE session)")
args = ap.parse_args()

cfg = emma_x_vlm_config()
shapes = jax.eval_shape(lambda: init_vlm_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16))
q4_shapes = jax.eval_shape(
    lambda p: quantize_vlm_params(p, bits=4, group=args.group), shapes)
q4 = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), q4_shapes)
tok = ByteLevelTokenizer()
rng = np.random.default_rng(0)
img = rng.integers(0, 256, size=(1, 256, 256, 3), dtype=np.uint8)
pixels = preprocess_for_towers(jnp.asarray(img), dinosiglip_transform_configs())
prompt = ("In: What action should the robot take to pick up the red cup on "
          "the left side of the table? CURRENT GRIPPER: [101, 156]\nOut: ")


def cast_scales(tree, dtype):
    """Quant dicts are {'q4', 'scale'[, 'layer']}: retype the scale rows."""
    def walk(x):
        if isinstance(x, dict):
            if "q4" in x and "scale" in x:
                return dict(x, scale=x["scale"].astype(dtype))
            return {k: walk(v) for k, v in x.items()}
        return x
    return walk(tree)


variants = (["bf16", "f32"] if args.scales == "both" else [args.scales])
for sdtype in variants:
    params = (q4 if sdtype == "bf16"
              else cast_scales(q4, jnp.float32))
    eng = ServingEngine(cfg, params, tok,
                        options=GenerateOptions(eos_id=tok.eos_id))

    def t(n):
        eng.generate_ids([prompt], pixels, max_new_tokens=n)
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            out = eng.generate_ids([prompt], pixels, max_new_tokens=n)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t128, t16 = t(128), t(16)
    per = (t128 - t16) / 112
    print(f"int4 g{args.group} scales={sdtype} decode: {1/per:6.1f} tok/s "
          f"({per*1e3:.2f} ms/tok); weights 3.5GB -> {3.5/per:5.0f} GB/s eff",
          flush=True)
    del eng, params
