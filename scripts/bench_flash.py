"""Flash-attention kernel timings on the real TPU (fwd + bwd, per impl).

Measures the shapes in docs/BENCHMARKS.md's kernel table — Emma-X's fused
training length (B8 L448: 19 text+patch tokens short of the bucketed 576,
chosen to match the original table) and the reference's max context (B2
L2048, ``/root/reference/prismatic/models/backbones/llm/llama2.py:58``) —
for the XLA dot-product path, the separate-pass Pallas backward, and the
fused dkv+dq Pallas backward (``flash_attention(fused_bwd=True)``).

    python scripts/bench_flash.py [--reps 20]

Prints one JSON line per (shape, impl).
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
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--shapes", default="8x448,8x576,2x2048",
                    help="comma list of BxL")
    ap.add_argument("--impls", default="xla,pallas,pallas_fused")
    ap.add_argument("--blocks", default="",
                    help="optional comma list of bq:bk:bq_bwd:bk_bwd "
                         "overrides swept for the pallas impls (empty = "
                         "the adaptive default)")
    ap.add_argument("--inner", type=int, default=1,
                    help="chain the attention op N times inside one jit "
                         "(output feeds the next call's q) and report "
                         "per-op time — the relay's ~26-28 ms d2h fetch "
                         "floor otherwise swamps sub-ms kernel deltas")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from emmax_tpu.ops.attention import multi_head_attention
    from emmax_tpu.ops.flash_attention import flash_attention

    H, D = 32, 128
    rng = np.random.default_rng(0)

    for shape in args.shapes.split(","):
        B, L = (int(v) for v in shape.split("x"))
        q = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.bfloat16)

        block_variants = [None]
        if args.blocks:
            block_variants = [tuple(int(x) for x in b.split(":"))
                              for b in args.blocks.split(",")]

        def attn(q, k, v, impl, blocks):
            if impl == "xla" or blocks is None:
                return multi_head_attention(q, k, v, causal=True, impl=impl)
            bq, bk, bqb, bkb = blocks
            return flash_attention(q, k, v, causal=True, block_q=bq,
                                   block_k=bk, block_q_bwd=bqb,
                                   block_k_bwd=bkb,
                                   fused_bwd=(impl == "pallas_fused"))

        N = args.inner

        for impl in args.impls.split(","):
          for blocks in (block_variants if impl != "xla" else [None]):

            def chain(q, k, v, impl, blocks):
                def body(qc, _):
                    o = attn(qc, k, v, impl, blocks)
                    # renormalize so the chain can't overflow bf16
                    return (o / jnp.maximum(
                        jnp.max(jnp.abs(o)), 1.0)).astype(qc.dtype), None
                out, _ = jax.lax.scan(body, q, None, length=N)
                return out

            @jax.jit
            def fwd(q, k, v, impl=impl, blocks=blocks):
                return chain(q, k, v, impl, blocks).astype(jnp.float32).sum()

            @jax.jit
            def bwd(q, k, v, impl=impl, blocks=blocks):
                def loss(q, k, v):
                    return chain(q, k, v, impl,
                                 blocks).astype(jnp.float32).sum()
                return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

            def t_of(fn):
                def force(out):
                    # the relay's block_until_ready can return before remote
                    # completion (memory: axon-relay-costs) — a host fetch of
                    # a reduction is the only reliable completion barrier
                    return np.asarray(jax.tree_util.tree_reduce(
                        lambda a, b: a + b.astype(jnp.float32).sum(),
                        out, jnp.float32(0)))

                force(fn(q, k, v))              # compile
                ts = []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    force(fn(q, k, v))
                    ts.append(time.perf_counter() - t0)
                return float(np.median(ts))

            t_f, t_b = t_of(fwd) / N, t_of(bwd) / N
            print(json.dumps({
                "bench": "flash_kernel", "B": B, "L": L, "impl": impl,
                "blocks": (":".join(str(x) for x in blocks)
                           if blocks else "adaptive"),
                "inner": N,
                "fwd_ms": round(t_f * 1e3, 3),
                "fwd_bwd_ms": round(t_b * 1e3, 3),
                "bwd_only_ms": round((t_b - t_f) * 1e3, 3),
                "device": str(jax.devices()[0]),
            }), flush=True)


if __name__ == "__main__":
    main()
