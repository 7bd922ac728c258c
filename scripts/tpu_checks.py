"""On-chip correctness checks (driven by tests/test_tpu_gated.py).

Runs on the REAL TPU (no JAX_PLATFORMS override) and prints one JSON line
per check. Small-but-structurally-real configs keep runtimes in seconds;
the 7B-scale equivalents live in scripts/bench_quant_quality.py.

    python scripts/tpu_checks.py quant_small
    python scripts/tpu_checks.py paged_parity
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _small_cfg():
    import jax.numpy as jnp

    from emmax_tpu.models.llama import LlamaConfig
    from emmax_tpu.models.vit import ViTConfig
    from emmax_tpu.models.vlm import VLMConfig

    # structurally llama-7B (GQA off, silu mlp, rope) at 1/4 width, 1/4 depth
    llm = LlamaConfig(dim=1024, n_layers=8, n_heads=8, n_kv_heads=8,
                      hidden_dim=2816, vocab_size=32064, max_seq_len=2048)
    vision = (
        ("dino", ViTConfig(img_size=56, patch_size=14, dim=256, depth=4,
                           n_heads=4, hidden_dim=1024, class_token=True,
                           num_reg_tokens=4, layerscale=True)),
        ("siglip", ViTConfig(img_size=56, patch_size=14, dim=256, depth=4,
                             n_heads=4, hidden_dim=1024, class_token=False,
                             num_reg_tokens=0, layerscale=False,
                             gelu_tanh=True)),
    )
    return VLMConfig(vision=vision, llm=llm, arch_specifier="fused-gelu-mlp")


def quant_small():
    import jax
    import jax.numpy as jnp

    from emmax_tpu.models.vlm import init_vlm_params
    from emmax_tpu.serving.engine import GenerateOptions, ServingEngine
    from emmax_tpu.serving.quant import quantize_vlm_params
    from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

    cfg = _small_cfg()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    tok = ByteLevelTokenizer()
    rng = np.random.default_rng(0)
    pixels = {name: jnp.asarray(rng.normal(
        size=(1, v.img_size, v.img_size, 3)).astype(np.float32))
        .astype(jnp.bfloat16) for name, v in cfg.vision}
    prompt = "In: pick up the spoon\nOut:"
    opts = GenerateOptions(eos_id=-1)
    n_new = 64

    # TEACHER-FORCED argmax agreement (one prefill over prompt + random
    # tokens, compare per-position argmax): free-run greedy with random
    # weights collapses to format-specific fixed points at position 0 and
    # measures nothing (same lesson as the 7B gate).
    from emmax_tpu.models.vlm import vlm_forward

    forced = rng.integers(300, 30000, size=256, dtype=np.int32)
    ids = jnp.asarray([tok.encode(prompt) + list(forced)], jnp.int32)

    outs = {}
    lls = {}
    for fmt in ("bf16", "int8", "int4"):
        if fmt == "bf16":
            p = params
        else:
            p = jax.jit(lambda q: quantize_vlm_params(
                q, bits=8 if fmt == "int8" else 4))(params)

        @jax.jit
        def tf_fwd(p, ids):
            logits, _, _ = vlm_forward(p, cfg, ids, pixels,
                                       mask=jnp.ones(ids.shape, jnp.bool_))
            return logits[0, -256:].astype(jnp.float32)

        ll = np.asarray(tf_fwd(p, ids))
        outs[fmt] = ll.argmax(-1)
        lls[fmt] = ll
    agree8 = float((outs["bf16"] == outs["int8"]).mean())
    agree4 = float((outs["bf16"] == outs["int4"]).mean())
    rmse8 = float(np.sqrt(np.mean((lls["bf16"] - lls["int8"]) ** 2)))
    rmse4 = float(np.sqrt(np.mean((lls["bf16"] - lls["int4"]) ** 2)))
    print(json.dumps({"check": "quant_small", "n_positions": 256,
                      "int8_agree": agree8, "int4_agree": agree4,
                      "int8_rmse": rmse8, "int4_rmse": rmse4,
                      "backend": str(__import__("jax").devices()[0])}))


def paged_parity():
    """Pallas paged-attention kernel vs XLA gather: SAME admitted pool, one
    decode step each, compare LOGITS numerically.

    Greedy token-stream equality across differently-compiled attention
    implementations is NOT a stable contract: random test weights have
    near-zero logit margins, so bf16-ulp numeric differences (legitimate —
    different fusion/accumulation orders) chain into different streams
    within a few tokens. A broken kernel (wrong pages, wrong masks) shows
    up as LARGE logit error on a single step; ulp noise does not."""
    import jax
    import jax.numpy as jnp

    from emmax_tpu.models.vlm import init_vlm_params
    from emmax_tpu.serving.engine import encode_frame
    from emmax_tpu.serving.paged import PagedServingEngine, _paged_decode_step
    from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

    cfg = _small_cfg()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    tok = ByteLevelTokenizer()
    rng = np.random.default_rng(0)
    pixels = {name: jnp.asarray(rng.normal(
        size=(1, v.img_size, v.img_size, 3)).astype(np.float32))
        .astype(jnp.bfloat16) for name, v in cfg.vision}
    patches = {"patches": encode_frame(params, cfg, pixels)}
    prompts = [f"In: stack the {w} cups\nOut:" for w in
               ("red", "blue", "green")]   # mixed lengths -> mixed cursors

    eng = PagedServingEngine(cfg, params, tok, num_slots=3, n_pages=16,
                             page_size=128, max_pages_per_slot=8,
                             burst=8, paged_attn="gather")
    for p in prompts:
        eng.submit(p, patches, max_new_tokens=24)
    eng._admit()
    for _ in range(2):          # a couple of real decode bursts first
        eng.step()

    outs = {}
    for mode in ("gather", "kernel"):
        _, nxt, logits = _paged_decode_step(
            params["llm"], cfg.llm, eng.pool, page_size=128, n_pages=16,
            paged_attn=mode)
        outs[mode] = (np.asarray(nxt), np.asarray(logits, np.float64))
    lg, lk = outs["gather"][1], outs["kernel"][1]
    rel_rmse = float(np.sqrt(np.mean((lg - lk) ** 2))
                     / (np.sqrt(np.mean(lg ** 2)) + 1e-9))
    agree = int((outs["gather"][0] == outs["kernel"][0]).sum())
    ok = rel_rmse < 2e-2 and agree >= 2
    print(json.dumps({"check": "paged_parity", "match": bool(ok),
                      "logit_rel_rmse": round(rel_rmse, 5),
                      "argmax_agree": f"{agree}/3",
                      "backend": str(jax.devices()[0])}))
    if not ok:
        sys.exit(1)


def flash_fused_bwd():
    """Fused (dq-in-dkv) vs separate-pass flash backward, COMPILED on the
    chip (the CPU tests run the same kernels in interpret mode): gradient
    rel-RMSE across multiple kv blocks with causal skip + padding mask."""
    import jax
    import jax.numpy as jnp

    from emmax_tpu.ops.flash_attention import flash_attention

    B, L, H, D = 2, 512, 8, 128
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.bfloat16)
    m = np.ones((B, L), bool)
    m[:, :56] = False
    m = jnp.asarray(m)

    def loss(fused):
        def f(q, k, v):
            o = flash_attention(q, k, v, kv_mask=m, causal=True,
                                block_q=128, block_k=128, block_q_bwd=128,
                                block_k_bwd=128, fused_bwd=fused)
            return jnp.sum(jnp.where(m[..., None, None], o, 0.0)
                           .astype(jnp.float32) ** 2)
        return f

    gf = jax.jit(jax.grad(loss(True), argnums=(0, 1, 2)))(q, k, v)
    gs = jax.jit(jax.grad(loss(False), argnums=(0, 1, 2)))(q, k, v)
    rel = {}
    for a, b, name in zip(gf, gs, ("dq", "dk", "dv")):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        rel[name] = float(np.sqrt(np.mean((a - b) ** 2))
                          / (np.sqrt(np.mean(b ** 2)) + 1e-9))
    ok = all(r < 2e-2 for r in rel.values())
    print(json.dumps({"check": "flash_fused_bwd", "match": bool(ok),
                      **{f"{n}_rel_rmse": round(r, 6)
                         for n, r in rel.items()},
                      "backend": str(jax.devices()[0])}))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    {"quant_small": quant_small, "paged_parity": paged_parity,
     "flash_fused_bwd": flash_fused_bwd}[sys.argv[1]]()
