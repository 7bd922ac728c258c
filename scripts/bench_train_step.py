"""Measured training-step wall time + MFU on the real TPU (VERDICT r2 item 3).

Two configs sized for ONE v5e chip (16 GB):

- ``proxy1b``: ~1.3B-param Llama proxy trained FULL (AdamW, bf16 params,
  fp32 moments) through the exact 7B code path — lax.scan layer loop, remat,
  flash/xla attention, fused multimodal splice, masked CE. The per-layer
  math is identical to the 7B config; only dims shrink.
- ``align7b``: the reference's ALIGN stage at the REAL 7B scale — frozen
  DINOv2-L + SigLIP-400M towers (stop-gradient), frozen Llama-2-7B, only
  the projector trains (``scripts/pretrain.py`` stage "align"; strategy hot
  loop ``base_strategy.py:157-292``). Backprop flows through all 32 frozen
  decoder layers to reach the projector, so this measures true 7B
  fwd+bwd-through cost.

Prints one JSON line per run: step wall time (median), tokens/s, and MFU
against the v5e bf16 peak (197 TFLOP/s), under two conventions:
``mfu_6nd`` (6·N·T, the standard reporting convention) and ``mfu_hw``
(adds the remat recompute + dx-only backward accounting actually executed).

    python scripts/bench_train_step.py --config proxy1b --attn flash
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Persistent compilation cache (same dir bench.py arms): the 7B align-step
# compile is minutes on the remote relay; pay it once across runs/rounds.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import numpy as np

V5E_BF16_PEAK = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="proxy1b",
                    choices=["proxy1b", "align7b"])
    ap.add_argument("--attn", default="xla",
                    choices=["xla", "pallas", "pallas_fused"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--text_len", type=int, default=320)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--remat", default="full",
                    choices=["full", "dots", "none"],
                    help="layer-scan checkpointing: full = reference-style "
                         "activation remat; dots = save MXU outputs, "
                         "recompute elementwise only; none = store all "
                         "activations (fastest if it fits HBM)")
    ap.add_argument("--ce_chunk", type=int, default=0,
                    help="sequence-chunked CE (chunked_ce_loss_and_preds): "
                         "never materializes the [B, F, vocab] fp32 logits "
                         "— needed to fit the 7B align step in 16 GB HBM")
    ap.add_argument("--dry_mem", action="store_true",
                    help="compile only and print XLA's memory analysis "
                         "(argument/output/temp/peak bytes) without "
                         "executing — for sizing 7B configs against HBM")
    ap.add_argument("--abstract", action="store_true",
                    help="with --dry_mem: lower from ShapeDtypeStructs "
                         "(jax.eval_shape) so NO device buffer is ever "
                         "created — a 14 GB param init left by a dry run "
                         "poisons the relay's HBM for ~40 min (CLAUDE.md); "
                         "abstract dry runs are free and can iterate")
    ap.add_argument("--ladder", default="",
                    help="comma list of extra B:T rungs (e.g. "
                         "'2:256,2:192'); all rungs run ASCENDING by B*T "
                         "over one shared state until the first OOM. "
                         "A crashed PROCESS leaves its 14 GB resident on "
                         "the relay for ~40 min (CLAUDE.md), so cross-"
                         "process retry ladders poison themselves; within "
                         "one process, ascending rungs measure every "
                         "config that fits before a too-big rung ends the "
                         "run (the step donates state, so an OOM rung "
                         "consumes it — nothing can run after).")
    ap.add_argument("--probe_free", action="store_true",
                    help="DEPRECATED no-op: a failed in-process alloc "
                         "poisons the axon client (all later allocs fast-"
                         "fail), so the post-state binary search would "
                         "kill the very step it was sizing. --wait_free "
                         "covers preflight headroom via subprocess probes")
    ap.add_argument("--cached_vision", action="store_true",
                    help="align-stage vision caching: feed pre-computed "
                         "channel-concat tower features "
                         "({'tower_features': [B, P, C]}) instead of "
                         "running the frozen towers — sound in frozen-"
                         "tower stages (outputs are constants per sample; "
                         "the projector still trains) and drops "
                         "params['vision'] from the device (-1.33 GB at "
                         "7B). MFU accounting excludes the skipped tower "
                         "forward.")
    ap.add_argument("--wait_free", default="",
                    help="'GB:minutes' preflight gate — BEFORE materializing "
                         "anything, spawn a FRESH SUBPROCESS that allocates "
                         "and frees a GB-sized probe buffer, retrying every "
                         "3 min up to 'minutes'. Subprocess-per-probe is "
                         "mandatory: a failed alloc poisons that client "
                         "(all later allocs fast-fail), so an in-process "
                         "retry loop can never pass after its first miss. "
                         "The relay keeps dead processes' buffers resident "
                         "well past the documented 20-40 min, so launching "
                         "a near-capacity job blind OOMs at runtime despite "
                         "a clean static fit. Exit code 3 on timeout, with "
                         "nothing left resident.")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from emmax_tpu.models.llama import IGNORE_INDEX, LlamaConfig
    from emmax_tpu.models.vlm import (VLMConfig, emma_x_vlm_config,
                                      init_vlm_params)
    from emmax_tpu.training.train_state import (create_train_state,
                                                make_optimizer,
                                                trainable_mask)
    from emmax_tpu.training.train_step import jit_train_step, make_train_step

    if args.config == "align7b":
        cfg = emma_x_vlm_config()
        stage = "align"
    else:
        # ~1.5B total (0.81B llm trained + real frozen towers): the
        # largest full-AdamW config that fits one 16 GB chip (fp32 moments
        # for trained params; full-train with vision moments needs 26 GB).
        # "vla-train" (frozen vision) is the reference's standard VLA
        # fine-tune stage (stage_from_flags(freeze_vision=True, ...)).
        llm = LlamaConfig(dim=2048, n_layers=16, n_heads=16, n_kv_heads=16,
                          hidden_dim=5504, vocab_size=32064,
                          max_seq_len=2048)
        base = emma_x_vlm_config()
        cfg = VLMConfig(vision=base.vision, llm=llm,
                        arch_specifier=base.arch_specifier)
        stage = "vla-train"

    def mark(msg):
        print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
              flush=True)

    def wait_free(gb: float, minutes: float) -> bool:
        """Block until a ``gb``-sized buffer is allocatable.

        Probes run in FRESH SUBPROCESSES, one attempt each: a failed alloc
        POISONS the axon client — every later alloc in that process
        fast-fails regardless of device state (measured round 4: after one
        14.8 GB failure, 0.5 GB fails in 0.0 s in the same process, while
        a fresh process allocates 6 GB fine). An in-process retry loop
        therefore can never pass after its first miss. A subprocess that
        succeeds frees its buffer in-process (immediate) and exits holding
        nothing; the PARENT performs no device op until the gate passes,
        so its own client stays fresh for the real run."""
        import subprocess
        # SINGLE-buffer probe: `jnp.ones(...) * 2` would materialize both
        # the ones input AND the product — 2x the intended bytes, so a
        # 15 GB probe demanded 30 GB on a 16 GB chip and could never pass
        # (round-5 root cause of a 90-min gate timeout on an EMPTY device).
        # jnp.full broadcasts a scalar: exactly one device buffer.
        probe_src = (
            "import sys\n"
            "import jax, jax.numpy as jnp\n"
            "rows = max(int(float(sys.argv[1]) * 2**30 / (2 * 4096)), 1)\n"
            "x = jnp.full((rows, 4096), 2.0, jnp.bfloat16)\n"
            "assert float(x[-1, -1]) == 2.0\n"
            "del x\n")
        deadline = time.monotonic() + minutes * 60
        while True:
            try:
                r = subprocess.run(
                    [sys.executable, "-c", probe_src, str(gb)],
                    capture_output=True, timeout=900)
                ok = r.returncode == 0
            except subprocess.TimeoutExpired:
                ok = False
            if ok:
                mark(f"wait_free: {gb:.2f} GB allocatable — proceeding")
                return True
            if time.monotonic() > deadline:
                mark(f"wait_free: timed out after {minutes:.0f} min — "
                     f"device still poisoned")
                return False
            mark(f"wait_free: {gb:.2f} GB not allocatable; sleeping 180 s")
            time.sleep(180)

    def materialize_tree(tree):
        """Force server-side allocation of every leaf, one tiny fetch per
        leaf (~30 ms each on the relay): reading element 0 completes that
        leaf's pending program chain and lets its temps free before the
        next leaf's chain runs."""
        for l in jax.tree_util.tree_leaves(tree):
            if isinstance(l, jax.Array) and l.size:
                np.asarray(l[(0,) * l.ndim])

    def make_state():
        """Params + train state, built ONCE and shared across ladder rungs
        (a 14 GiB re-init per rung OOMs while the previous rung's buffers
        are still draining through the relay)."""
        mark("init params")
        if args.abstract:
            if not args.dry_mem:
                raise SystemExit("--abstract requires --dry_mem")
            params = jax.eval_shape(
                lambda: init_vlm_params(jax.random.PRNGKey(0), cfg,
                                        jnp.bfloat16))
        else:
            params = init_vlm_params(jax.random.PRNGKey(0), cfg,
                                     jnp.bfloat16)
            jax.block_until_ready(params)
        mark("params ready")
        if not args.abstract:
            # MATERIALIZE params now, LEAF BY LEAF: on the lazy relay
            # block_until_ready reports ready without allocating, so the
            # donating state init below would otherwise run against
            # not-yet-resident inputs. And a single whole-tree touch OOMs
            # too (measured: 15.2 GB free, 14.0 GB of params, still
            # ResourceExhausted): the deferred replay executes EVERY
            # pending init program under one fetch, holding the f32 RNG
            # intermediates of all ~500 leaves live at once (~3x params).
            # One tiny fetch per leaf completes each leaf's init chain and
            # frees its temps before the next starts; afterwards exactly
            # the bf16 params are resident.
            materialize_tree(params)
            mark("params materialized on device (leaf-by-leaf)")
        n_params = sum(int(np.prod(l.shape))
                       for l in jax.tree_util.tree_leaves(params))
        # per-component counts NOW — after state creation the old `params`
        # buffers must be dead (see donate note below)
        n_llm = sum(int(np.prod(l.shape)) for l in
                    jax.tree_util.tree_leaves(params["llm"]))
        n_vis = sum(int(np.prod(l.shape)) for l in
                    jax.tree_util.tree_leaves(params["vision"]))
        n_proj = sum(int(np.prod(l.shape)) for l in
                     jax.tree_util.tree_leaves(params["projector"]))
        if args.cached_vision:
            # frozen towers never run with cached features — drop them from
            # the device entirely (their buffers are lazy: never read, so
            # never materialized)
            params = {k: v for k, v in params.items() if k != "vision"}
        tx, _ = make_optimizer(params, learning_rate=2e-5, weight_decay=0.01,
                               max_grad_norm=1.0,
                               lr_scheduler_type="constant",
                               total_steps=100, stage=stage)
        mark("creating train state (one jitted init)")
        # one jitted init: eager tx.init dispatches/compiles per leaf shape,
        # which costs many minutes on the remote-compile relay. DONATE the
        # params: without donation the jit materializes a second 14 GiB
        # param tree (lazily — the relay defers buffer allocation, so the
        # duplicate only surfaces as a RESOURCE_EXHAUSTED at the first
        # train-step execution, 2 GiB past a 15.75 GiB limit)
        if args.abstract:
            state = jax.eval_shape(lambda pp: create_train_state(pp, tx),
                                   params)
            del params
        else:
            state = jax.jit(lambda pp: create_train_state(pp, tx),
                            donate_argnums=(0,))(params)
            del params
            jax.block_until_ready(state.opt_state)
            # FORCE full state materialization the same leaf-by-leaf way —
            # an unmaterialized state surfaces as an opaque
            # ResourceExhausted inside the DONATING step execution; if the
            # state itself doesn't fit, THIS fails, cleanly attributed.
            materialize_tree(state)
            mark("state materialized on device (leaf-by-leaf)")
        # drop the init/state-creation executables: compiled programs occupy
        # HBM, and the 7B align step runs within ~300 MB of the 15.75 GB
        # limit — every resident byte matters
        jax.clear_caches()
        mark("train state ready")
        if args.probe_free and not args.abstract:
            # DISABLED (round 4): a failed alloc POISONS the axon client —
            # every later alloc in this process (including the train step
            # about to be timed) fast-fails. The binary search necessarily
            # hits failures, so probing here would kill the run it was
            # meant to protect. The --wait_free subprocess gate is the
            # safe preflight.
            mark("probe_free disabled: in-process alloc failures poison "
                 "the client (see wait_free docstring); skipping")
        return state, (n_params, n_llm, n_vis, n_proj), tx

    def run_config(state, counts, tx, B, T):
        n_params, n_llm, n_vis, n_proj = counts
        print(f"# config={args.config} stage={stage} attn={args.attn} "
              f"B={B} text_len={T}", file=sys.stderr)
        step = jit_train_step(make_train_step(
            cfg, tx, attn_impl=args.attn,
            remat=False if args.remat == "none" else args.remat,
            # frozen-vision stages skip the tower backward entirely; the
            # freeze mask excludes fully-frozen leaves from differentiation
            # so no frozen-param-sized gradient tree is ever materialized
            stop_vision_gradient=(stage in ("align", "vla-train")),
            freeze_mask=trainable_mask(state.params, stage),
            compute_dtype=jnp.bfloat16,
            ce_chunk=args.ce_chunk or None))

        rng = np.random.default_rng(0)
        ids = rng.integers(3, 30000, size=(B, T)).astype(np.int32)
        ids[:, 0] = 1
        labels = ids.copy()
        labels[:, : T // 3] = IGNORE_INDEX
        C = sum(v.dim for _, v in cfg.vision)
        if args.abstract:
            pv = ({"tower_features": jax.ShapeDtypeStruct(
                      (B, cfg.num_patches, C), jnp.bfloat16)}
                  if args.cached_vision else
                  {name: jax.ShapeDtypeStruct(
                      (B, v.img_size, v.img_size, 3), jnp.bfloat16)
                   for name, v in cfg.vision})
            batch = {
                "input_ids": jax.ShapeDtypeStruct((B, T), jnp.int32),
                "attention_mask": jax.ShapeDtypeStruct((B, T), jnp.bool_),
                "labels": jax.ShapeDtypeStruct((B, T), jnp.int32),
                "pixel_values": pv,
            }
        else:
            pv = ({"tower_features": jnp.asarray(rng.normal(
                      size=(B, cfg.num_patches, C)).astype(np.float32))
                      .astype(jnp.bfloat16)}
                  if args.cached_vision else
                  {name: jnp.asarray(rng.normal(
                      size=(B, v.img_size, v.img_size, 3)).astype(np.float32))
                      .astype(jnp.bfloat16) for name, v in cfg.vision})
            batch = {
                "input_ids": jnp.asarray(ids),
                "attention_mask": jnp.ones((B, T), jnp.bool_),
                "labels": jnp.asarray(labels),
                "pixel_values": pv,
            }

        if args.dry_mem:
            mark("lowering + compiling (dry_mem)")
            compiled = step.lower(state, batch).compile()
            ma = compiled.memory_analysis()
            print(json.dumps({
                "bench": "train_step_dry_mem", "config": args.config,
                "batch": B, "text_len": T, "remat": args.remat,
                "attn": args.attn, "ce_chunk": args.ce_chunk,
                "argument_gb": round(ma.argument_size_in_bytes / 2**30, 3),
                "output_gb": round(ma.output_size_in_bytes / 2**30, 3),
                "temp_gb": round(ma.temp_size_in_bytes / 2**30, 3),
                "alias_gb": round(ma.alias_size_in_bytes / 2**30, 3),
                # the executable itself is HBM-resident at run time but NOT
                # part of peak_gb's static analysis — add it when sizing
                # against the 15.75 GB limit
                "code_mb": round(
                    ma.generated_code_size_in_bytes / 2**20, 1),
                "peak_gb": round((ma.argument_size_in_bytes
                                  + ma.output_size_in_bytes
                                  + ma.temp_size_in_bytes
                                  - ma.alias_size_in_bytes) / 2**30, 3),
            }))
            return state
        mark("compiling train step")
        state, m = step(state, batch)          # compile
        _ = float(m["loss"])
        mark("compiled; timing")
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            state, m = step(state, batch)
            _ = float(m["loss"])               # forces the fetch
            times.append(time.perf_counter() - t0)
        t_med = float(np.median(times))

        # --- FLOPs accounting
        P = cfg.num_patches
        F = T + P                              # fused LLM sequence
        tok_llm = B * F
        tok_vis = 0 if args.cached_vision else B * (P + 8)  # + prefix, approx
        # matmul flops: fwd 2N/token; dW bwd 2N (trainable only); dx bwd 2N
        # vis_bwd must match stop_vision_gradient above: frozen-vision
        # stages (align AND vla-train) never run the tower backward, so
        # counting it would inflate mfu_hw for the headline proxy config
        trainable_llm = 0.0 if stage == "align" else n_llm
        vis_bwd = 0.0 if stage in ("align", "vla-train") \
            else 4 * n_vis * tok_vis
        fwd = 2 * (n_llm * tok_llm + n_vis * tok_vis + n_proj * B * P)
        bwd = (2 * n_llm * tok_llm            # dx through llm
               + 2 * trainable_llm * tok_llm  # dW
               + vis_bwd
               + 4 * n_proj * B * P)
        attn = 4 * B * F * F * cfg.llm.dim    # qk + av, fwd
        # remat recompute actually executed: full = the whole layer fwd;
        # dots = elementwise only (negligible matmuls); none = nothing
        remat_extra = fwd if args.remat == "full" else 0.0
        flops_6nd = 6 * (n_llm * tok_llm + n_vis * tok_vis + n_proj * B * P)
        flops_hw = fwd + bwd + remat_extra + 3 * attn

        print(json.dumps({
            "bench": "train_step",
            "config": args.config,
            "stage": stage,
            "cached_vision": bool(args.cached_vision),
            "attn": args.attn,
            "remat": args.remat,
            "batch": B,
            "text_len": T,
            "fused_seq": F,
            "params_b": round(n_params / 1e9, 3),
            "step_ms": round(t_med * 1e3, 1),
            "steps_per_s": round(1.0 / t_med, 3),
            "tokens_per_s": round(tok_llm / t_med, 1),
            "examples_per_s": round(B / t_med, 2),
            "mfu_6nd": round(flops_6nd / t_med / V5E_BF16_PEAK, 4),
            "mfu_hw": round(flops_hw / t_med / V5E_BF16_PEAK, 4),
            "device": str(jax.devices()[0]),
        }))
        return state

    # Ladder semantics (rewritten after the r4 OOM post-mortem): rungs run
    # ASCENDING over ONE shared param/state tree. Descending retry-on-OOM
    # cannot work here — the step donates `state` into the failing
    # execution (buffers consumed) and a fresh 14 GiB re-init races the
    # relay's asynchronous release of the dead rung's memory. Ascending,
    # every config that fits is measured before a too-big rung ends the
    # process, and the largest-fitting number is never lost.
    rungs = [(args.batch, args.text_len)]
    if args.ladder:
        rungs += [tuple(int(x) for x in r.split(":"))
                  for r in args.ladder.split(",")]
    rungs = sorted(set(rungs), key=lambda bt: bt[0] * bt[1])
    if args.wait_free and not args.abstract:
        gb, _, mins = args.wait_free.partition(":")
        if not wait_free(float(gb), float(mins or 60)):
            raise SystemExit(3)
    state, counts, tx = make_state()
    for i, (B, T) in enumerate(rungs):
        try:
            state = run_config(state, counts, tx, B, T)
        except jax.errors.JaxRuntimeError as e:
            msg = str(e)
            if "RESOURCE_EXHAUSTED" not in msg and "Ran out of memory" not in msg:
                raise
            if "compile" in msg.lower():
                # STATIC (chipless AOT) rejection: no execution was
                # dispatched, the donated state is intact — later rungs can
                # still run. Shape quirk this guards: B=1 T=320 align7b
                # statically needs 17.8 GB (XLA hoists layout-transposed
                # copies of the stacked qkv at that shape) while B=2 T=320
                # fits in 15.03 GB.
                mark(f"rung B={B} T={T} does not fit STATICALLY "
                     f"(compile-time OOM) — skipping to next rung")
                continue
            mark(f"rung B={B} T={T} OOM at runtime; donated state consumed "
                 f"— stopping (smaller rungs above already reported)")
            # surface the allocator's own numbers (what was asked for, what
            # was free) — the swallowed message is the only diagnostic
            head = "\n".join(msg.splitlines()[:12])
            mark(f"runtime OOM detail:\n{head}")
            return
        # step executables occupy HBM; drop before the next (bigger) rung
        jax.clear_caches()
        gc.collect()


if __name__ == "__main__":
    main()
