"""Paged-KV continuous batching: token parity with the dense slot-pool
engine, page recycling, and higher concurrency at fixed HBM."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
from emmax_tpu.serving.continuous import ContinuousServingEngine
from emmax_tpu.serving.engine import (GenerateOptions, ServingEngine,
                                      encode_frame)
from emmax_tpu.serving.paged import PagedServingEngine
from emmax_tpu.vla.tokenizer import ByteLevelTokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_vlm_config(vocab_size=1024)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tok = ByteLevelTokenizer(1024)

    def pixels(seed=0):
        # pre-encoded patches shared by every engine under test: two ViT
        # towers compiled into DIFFERENT jit programs legitimately differ
        # by bf16 ulps (fusion order), and greedy decode on margin-free
        # random weights amplifies that into different token streams —
        # exact cross-engine parity is only a stable contract when the
        # patch values are bit-identical (found via the on-chip
        # paged-parity gate; see scripts/tpu_checks.py)
        r = np.random.default_rng(seed)
        raw = {name: jnp.asarray(r.normal(size=(1, v.img_size, v.img_size,
                                                3)).astype(np.float32))
               for name, v in cfg.vision}
        return {"patches": encode_frame(params, cfg, raw)}

    return cfg, params, tok, pixels


def _reference_tokens(cfg, params, tok, prompt, pixels, max_new):
    engine = ServingEngine(cfg, params, tok,
                           options=GenerateOptions(eos_id=tok.eos_id))
    out = engine.generate_ids([prompt], pixels, max_new_tokens=max_new)[0]
    toks = list(out)
    return toks[:toks.index(tok.eos_id)] if tok.eos_id in toks else toks


def test_paged_matches_plain_engine_tokens(setup):
    cfg, params, tok, pixels = setup
    eng = PagedServingEngine(cfg, params, tok, num_slots=2, n_pages=24,
                             page_size=32, max_pages_per_slot=8)
    prompts = ["In: pick up the cup\nOut:", "In: wipe the table\nOut:"]
    rids = [eng.submit(p, pixels(i), max_new_tokens=8)
            for i, p in enumerate(prompts)]
    out = eng.run_until_complete()
    for i, (rid, p) in enumerate(zip(rids, prompts)):
        ref = _reference_tokens(cfg, params, tok, p, pixels(i), 8)
        assert out[rid][:len(ref)] == ref, (i, out[rid], ref)


def test_paged_matches_continuous_engine(setup):
    cfg, params, tok, pixels = setup
    prompt = "In: stack the blocks\nOut:"
    dense = ContinuousServingEngine(cfg, params, tok, num_slots=1,
                                    cache_len=256)
    rid_d = dense.submit(prompt, pixels(3), max_new_tokens=6)
    dense_out = dense.run_until_complete()[rid_d]
    paged = PagedServingEngine(cfg, params, tok, num_slots=1, n_pages=12,
                               page_size=32, max_pages_per_slot=8)
    rid_p = paged.submit(prompt, pixels(3), max_new_tokens=6)
    paged_out = paged.run_until_complete()[rid_p]
    assert paged_out == dense_out


def test_page_recycling_and_higher_concurrency_at_fixed_hbm(setup):
    """The page pool holds FEWER total KV slots than the dense engine would
    reserve for the same concurrency, yet serves more requests than fit at
    once by recycling retired pages."""
    cfg, params, tok, pixels = setup
    num_slots, page_size, n_pages = 4, 32, 20
    # dense reservation for 4 slots at cache_len 256 = 1024 token-slots;
    # the page pool only holds 640 — .625x the HBM for the same concurrency
    assert n_pages * page_size < num_slots * 256
    eng = PagedServingEngine(cfg, params, tok, num_slots=num_slots,
                             n_pages=n_pages, page_size=page_size,
                             max_pages_per_slot=8)
    prompts = [f"In: task number {i}\nOut:" for i in range(6)]
    rids = [eng.submit(p, pixels(10 + i), max_new_tokens=4)
            for i, p in enumerate(prompts)]
    out = eng.run_until_complete()
    assert set(out) == set(rids)
    for i, (rid, p) in enumerate(zip(rids, prompts)):
        ref = _reference_tokens(cfg, params, tok, p, pixels(10 + i), 4)
        assert out[rid][:len(ref)] == ref
    # all pages returned to the free list at the end
    assert sorted(eng.free_pages) == list(range(n_pages))


def test_submit_rejects_oversized_request(setup):
    cfg, params, tok, pixels = setup
    eng = PagedServingEngine(cfg, params, tok, num_slots=1, n_pages=8,
                             page_size=32, max_pages_per_slot=4)
    with pytest.raises(ValueError, match="pages"):
        eng.submit("In: x\nOut:", pixels(0), max_new_tokens=512)


def test_paged_quantized_cache(setup):
    """int8 pages (per-row absmax scales): engine completes, produces the
    right shape of output, and the early tokens track the bf16-page run
    (same contract as the dense engine's int8 KV cache tests)."""
    cfg, params, tok, pixels = setup
    prompt = "In: wipe the table\nOut:"

    def run(quantized):
        eng = PagedServingEngine(cfg, params, tok, num_slots=2, n_pages=12,
                                 page_size=64, max_pages_per_slot=6,
                                 burst=4, paged_attn="gather",
                                 quantized_cache=quantized)
        rid = eng.submit(prompt, pixels(0), max_new_tokens=12)
        done = eng.run_until_complete()
        return done[rid]

    dense = run(False)
    quant = run(True)
    assert len(quant) == len(dense)
    # greedy argmax should agree at least early in the rollout
    n_agree = sum(a == b for a, b in zip(dense[:4], quant[:4]))
    assert n_agree >= 3, (dense, quant)


@pytest.mark.parametrize("variant", ["gather2", "pagescan", "poolmask", "burstdense"])
@pytest.mark.parametrize("quantized", [False, True])
def test_paged_attn_variants_token_parity(setup, variant, quantized):
    """Every decode-attention variant must emit the same greedy tokens as
    the XLA gather baseline — mixed-length slots so ownership masks, page
    walks, and length masking are all exercised (incl. int8 pages)."""
    cfg, params, tok, pixels = setup
    prompts = ["In: pick up the cup\nOut:", "In: wipe that big table\nOut:"]

    def run(attn):
        eng = PagedServingEngine(cfg, params, tok, num_slots=2, n_pages=16,
                                 page_size=32, max_pages_per_slot=8,
                                 burst=4, paged_attn=attn,
                                 quantized_cache=quantized)
        rids = [eng.submit(p, pixels(40 + i), max_new_tokens=6 + 3 * i)
                for i, p in enumerate(prompts)]
        done = eng.run_until_complete()
        return [done[r] for r in rids]

    base = run("gather")
    got = run(variant)
    if variant in ("poolmask", "burstdense"):
        # poolmask/burstdense compute with bf16 einsum operands (f32
        # accumulation)
        # and fold int8 scales into scores/probs instead of dequantizing
        # rows — numerics differ in the last ulp, so allow a late-token
        # divergence but require early agreement
        for b, g in zip(base, got):
            n = min(4, len(b), len(g))
            assert g[:n] == b[:n], (base, got)
    else:
        assert got == base, (variant, quantized, base, got)


@pytest.mark.parametrize("quantized", [False, True])
def test_burstdense_uniform_write_fast_path_exact(setup, quantized):
    """The uniform-write fast path (all slots enter the burst at equal
    length -> one batched DUS per buffer per layer instead of B per-row
    DUS) must emit EXACTLY the tokens of the per-row path — identical
    values land at identical offsets; only the write granularity changes.
    Unequal max_new forces one row to finish MID-burst (its junk rows must
    stay masked); the next burst then sees diverged lengths (one slot
    retired), which exercises the auto-fallback to the per-row path."""
    cfg, params, tok, pixels = setup
    prompts = ["In: pick up the cup\nOut:", "In: wipe the tables\nOut:"]
    assert len(prompts[0]) == len(prompts[1])  # equal fused lengths

    def run(uniform):
        eng = PagedServingEngine(cfg, params, tok, num_slots=2, n_pages=16,
                                 page_size=32, max_pages_per_slot=8,
                                 burst=8, paged_attn="burstdense",
                                 quantized_cache=quantized,
                                 uniform_burst_writes=uniform)
        rids = [eng.submit(p, pixels(60 + i), max_new_tokens=4 + 8 * i)
                for i, p in enumerate(prompts)]
        done = eng.run_until_complete()
        return [done[r] for r in rids]

    assert run(True) == run(False)


def test_warmup_precompiles_both_burst_variants(setup):
    """warmup() must compile BOTH uniform_write executables up front (the
    flag is a static jit arg — without warmup the first diverged-length
    burst pays a lazy compile mid-serving), and a post-warmup serve that
    crosses the uniform -> per-row switch must still be token-correct."""
    cfg, params, tok, pixels = setup
    eng = PagedServingEngine(cfg, params, tok, num_slots=2, n_pages=16,
                             page_size=32, max_pages_per_slot=8,
                             burst=8, paged_attn="burstdense")
    assert sorted(eng.warmup()) == [False, True]
    assert set(eng._burst_exec) == {False, True}
    prompts = ["In: pick up the cup\nOut:", "In: wipe the tables\nOut:"]
    rids = [eng.submit(p, pixels(60 + i), max_new_tokens=4 + 8 * i)
            for i, p in enumerate(prompts)]
    done = eng.run_until_complete()
    # no NEW executables were compiled while serving
    assert set(eng._burst_exec) == {False, True}
    base = PagedServingEngine(cfg, params, tok, num_slots=2, n_pages=16,
                              page_size=32, max_pages_per_slot=8,
                              burst=8, paged_attn="burstdense")
    rb = [base.submit(p, pixels(60 + i), max_new_tokens=4 + 8 * i)
          for i, p in enumerate(prompts)]
    assert [done[r] for r in rids] == [base.run_until_complete()[r]
                                       for r in rb]


def test_shared_prefix_admission_matches_solo(setup):
    """submit_shared: N same-frame queries share the BOS+patch-block KV in
    refcounted pages; tails prefill individually. Tokens must match each
    prompt run alone on the plain engine, shared pages must be freed only
    after the LAST group member retires, and the group must hold fewer
    pages than N independent admissions would."""
    cfg, params, tok, pixels = setup
    ps = 4                                   # prefix_len = 1 + 4 patches
    prefix_len = 1 + cfg.num_patches
    p0 = prefix_len // ps                    # 1 full shared page
    assert p0 >= 1
    px = pixels(7)
    prompts = ["In: pick up the cup\nOut:", "In: wipe the table\nOut:",
               "In: close that drawer now\nOut:"]   # mixed tail lengths
    eng = PagedServingEngine(cfg, params, tok, num_slots=3, n_pages=64,
                             page_size=ps, max_pages_per_slot=16,
                             burst=4, paged_attn="burstdense")
    rids = eng.submit_shared(prompts, px, max_new_tokens=6)
    shared_ids = list(eng._shared_refs.values())[0]["ids"]
    assert len(shared_ids) == -(-prefix_len // ps)
    eng._admit()
    # the full shared pages appear in EVERY running slot's table mirror
    own_union = set()
    for req in eng.running.values():
        assert req.n_pages >= p0
        own_union.update(req.page_ids)
    assert own_union.isdisjoint(shared_ids)
    done = eng.run_until_complete()
    for rid, p in zip(rids, prompts):
        ref = _reference_tokens(cfg, params, tok, p, px, 6)
        assert done[rid][:len(ref)] == ref, (p, done[rid], ref)
    # every page (shared + own) returned to the free list
    assert sorted(eng.free_pages) == list(range(64))


def test_shared_prefix_refcount_holds_until_last(setup):
    """With one slot, group members run sequentially; the shared pages must
    stay allocated across retirements until the last member finishes."""
    cfg, params, tok, pixels = setup
    px = pixels(9)
    eng = PagedServingEngine(cfg, params, tok, num_slots=1, n_pages=32,
                             page_size=4, max_pages_per_slot=16,
                             burst=4, paged_attn="gather")
    rids = eng.submit_shared(["In: lift the box\nOut:",
                              "In: push the plate\nOut:"], px,
                             max_new_tokens=4)
    key = next(iter(eng._shared_refs))
    shared_ids = set(eng._shared_refs[key]["ids"])
    saw_mid = False
    for _ in range(200):
        eng.step()
        if eng.finished and (eng.running or eng.queue):
            assert key in eng._shared_refs       # first retired, pages held
            assert shared_ids.isdisjoint(eng.free_pages)
            saw_mid = True
        if not eng.queue and not eng.running:
            break
    assert saw_mid and key not in eng._shared_refs
    assert sorted(eng.free_pages) == list(range(32))
    for rid, p in zip(rids, ["In: lift the box\nOut:",
                             "In: push the plate\nOut:"]):
        ref = _reference_tokens(cfg, params, tok, p, px, 4)
        assert eng.finished[rid][:len(ref)] == ref


def test_freed_page_reuse_not_corrupted_by_stale_slot(setup):
    """A finished slot keeps its stale device page-table row; when its freed
    pages are reassigned to a still-running request, the inactive slot's
    burst-dense writeback must NOT clobber the new owner (regression for
    the active-at-burst-start writeback gate).

    Scenario engineering: the long request B sits in a LOWER slot than the
    short request A (writeback iterates slots ascending, so without the
    gate A's stale whole-page write lands AFTER B's and wins), and the
    page pool is sized so B's growth reaches A's old CURSOR page (the page
    a stale slot keeps touching)."""
    cfg, params, tok, pixels = setup
    px = pixels(55)
    prompt_b = "In: wipe the table !\nOut:"     # slot 0, keeps growing
    prompt_a = "In: pick up the cup\nOut:"      # slot 1, finishes fast
    eng = PagedServingEngine(cfg, params, tok, num_slots=2, n_pages=4,
                             page_size=32, max_pages_per_slot=5,
                             burst=4, paged_attn="burstdense")
    rid_b = eng.submit(prompt_b, px, max_new_tokens=90)
    rid_a = eng.submit(prompt_a, px, max_new_tokens=4)
    done = eng.run_until_complete()
    assert rid_a in done and rid_b in done
    # B must actually have reused A's cursor page for the test to bite
    ref_b = _reference_tokens(cfg, params, tok, prompt_b, px, 90)
    assert done[rid_b][:len(ref_b)] == ref_b, (done[rid_b][:12], ref_b[:12])
    ref_a = _reference_tokens(cfg, params, tok, prompt_a, px, 4)
    assert done[rid_a][:len(ref_a)] == ref_a
    assert sorted(eng.free_pages) == list(range(4))


@pytest.mark.parametrize("page_size,quantized", [(32, False), (4, True),
                                                 (5, False)])
def test_shared_prefix_corner_configs(setup, page_size, quantized):
    """Shared prefix across page geometries: ps=32 → prefix smaller than a
    page (p0=0, boundary-copy only); ps=4 + int8 pages (quantized gather +
    requantized boundary rows); ps=5 → prefix_len % ps == 0 (page-aligned,
    no boundary page in the own region)."""
    cfg, params, tok, pixels = setup
    prefix_len = 1 + cfg.num_patches
    if page_size == 5:
        assert prefix_len % page_size == 0
    px = pixels(11)
    prompts = ["In: fold the shirt\nOut:", "In: open the jar lid\nOut:"]
    eng = PagedServingEngine(cfg, params, tok, num_slots=2, n_pages=64,
                             page_size=page_size, max_pages_per_slot=32,
                             burst=4, quantized_cache=quantized)
    rids = eng.submit_shared(prompts, px, max_new_tokens=5)
    done = eng.run_until_complete()
    for rid, p in zip(rids, prompts):
        ref = _reference_tokens(cfg, params, tok, p, px, 5)
        n = min(3, len(ref)) if quantized else len(ref)
        assert done[rid][:n] == ref[:n], (p, done[rid], ref)
    assert sorted(eng.free_pages) == list(range(64))


def test_mixed_shared_and_plain_queue(setup):
    """Plain submissions and shared-prefix groups interleave through the
    same queue/scheduler; all outputs must match solo runs."""
    cfg, params, tok, pixels = setup
    px = pixels(70)
    eng = PagedServingEngine(cfg, params, tok, num_slots=2, n_pages=40,
                             page_size=8, max_pages_per_slot=12, burst=4)
    plain_p = "In: sort the bolts\nOut:"
    r_plain = eng.submit(plain_p, px, max_new_tokens=5)
    shared_p = ["In: pick a bowl\nOut:", "In: tip the jug slowly\nOut:"]
    r_shared = eng.submit_shared(shared_p, px, max_new_tokens=5)
    done = eng.run_until_complete()
    for rid, p in [(r_plain, plain_p)] + list(zip(r_shared, shared_p)):
        ref = _reference_tokens(cfg, params, tok, p, px, 5)
        assert done[rid][:len(ref)] == ref, (p, done[rid], ref)
    assert sorted(eng.free_pages) == list(range(40))


@pytest.mark.parametrize("page_size", [4, 32, 5])
def test_shared_prefix_equal_tails_batch_into_one_admission(setup,
                                                            page_size):
    """Equal-length tails in one shared-prefix group must admit through a
    SINGLE batched tail prefill (G=3), with token parity vs solo runs and
    full page recycling — across page geometries: ps=4 (boundary-copy),
    ps=32 (prefix smaller than a page, p0=0), ps=5 (page-aligned prefix,
    no boundary rows in the own region)."""
    cfg, params, tok, pixels = setup
    px = pixels(23)
    # byte-level tokenizer: equal strings lengths with identical space
    # positions encode to equal token counts
    prompts = ["In: pick up the cup\nOut:", "In: pick up the pot\nOut:",
               "In: pick up the jar\nOut:"]
    lens = {len(tok.encode(p)) for p in prompts}
    assert len(lens) == 1, lens
    eng = PagedServingEngine(cfg, params, tok, num_slots=3, n_pages=64,
                             page_size=page_size, max_pages_per_slot=16,
                             burst=4)
    calls = []
    orig = eng._admit_shared_tails

    def spy(reqs, slots):
        calls.append(len(reqs))
        return orig(reqs, slots)

    eng._admit_shared_tails = spy
    rids = eng.submit_shared(prompts, px, max_new_tokens=6)
    done = eng.run_until_complete()
    assert calls == [3], calls               # one G=3 batched admission
    for rid, p in zip(rids, prompts):
        ref = _reference_tokens(cfg, params, tok, p, px, 6)
        assert done[rid][:len(ref)] == ref, (p, done[rid], ref)
    assert sorted(eng.free_pages) == list(range(64))


def test_shared_tails_fragmented_free_list(setup):
    """After recycling, the free list is arbitrary: popped own pages are no
    longer consecutive, so the batched tail admission must take the
    per-page DUS path (contiguous=False) and still produce solo-run parity
    (regression guard for the contiguous fast-path gate)."""
    cfg, params, tok, pixels = setup
    px = pixels(31)
    prompts = ["In: pick up the cup\nOut:", "In: pick up the pot\nOut:"]
    eng = PagedServingEngine(cfg, params, tok, num_slots=2, n_pages=64,
                             page_size=4, max_pages_per_slot=16, burst=4)
    # simulate post-recycling order: interleave front/back of the free list
    half = len(eng.free_pages) // 2
    eng.free_pages = [p for pair in zip(eng.free_pages[:half],
                                        reversed(eng.free_pages[half:]))
                      for p in pair]
    taken = []
    orig_tails = eng._admit_shared_tails

    def spy(reqs, slots):
        before = list(eng.free_pages)
        orig_tails(reqs, slots)
        n = len(before) - len(eng.free_pages)
        taken.append(before[:n])

    eng._admit_shared_tails = spy
    rids = eng.submit_shared(prompts, px, max_new_tokens=6)
    done = eng.run_until_complete()
    flat = [p for grp in taken for p in grp]
    assert flat != sorted(flat) or any(
        b - a != 1 for a, b in zip(flat, flat[1:])), flat  # truly scattered
    for rid, p in zip(rids, prompts):
        ref = _reference_tokens(cfg, params, tok, p, px, 6)
        assert done[rid][:len(ref)] == ref, (p, done[rid], ref)
    assert sorted(eng.free_pages) == list(range(64))
