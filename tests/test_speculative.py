"""Prompt-lookup speculative decoding: drafts, exactness, acceptance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
from emmax_tpu.serving.engine import GenerateOptions, ServingEngine
from emmax_tpu.serving.speculative import SpeculativeEngine, lookup_draft
from emmax_tpu.vla.tokenizer import ByteLevelTokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_vlm_config(vocab_size=512)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tok = ByteLevelTokenizer(vocab_size=512)
    return cfg, params, tok


def _pixels(cfg, rng, B):
    return {name: jnp.asarray(rng.normal(size=(B, v.img_size, v.img_size, 3))
                              .astype(np.float32)) for name, v in cfg.vision}


# ---------------------------------------------------------------- drafts

def _hist(rows, H=24):
    hist = np.full((len(rows), H), -1, np.int32)
    for i, r in enumerate(rows):
        hist[i, :len(r)] = r
    hlen = np.asarray([len(r) for r in rows], np.int32)
    return jnp.asarray(hist), jnp.asarray(hlen)


def test_lookup_draft_continuation():
    # history ...[7, 8] 9 10 11... ends in [7, 8] -> draft 9 10 11 (then -1s)
    hist, hlen = _hist([[1, 7, 8, 9, 10, 11, 3, 7, 8]])
    draft = np.asarray(lookup_draft(hist, hlen, 4))
    np.testing.assert_array_equal(draft[0], [9, 10, 11, 3])


def test_lookup_draft_prefers_most_recent_match():
    # bigram [5, 5] occurs twice; the later occurrence (followed by 2) wins
    hist, hlen = _hist([[5, 5, 1, 9, 5, 5, 2, 9, 5, 5]])
    draft = np.asarray(lookup_draft(hist, hlen, 2))
    np.testing.assert_array_equal(draft[0], [2, 9])


def test_lookup_draft_no_match_and_short_history():
    hist, hlen = _hist([[1, 2, 3, 4],      # no earlier [3, 4]
                        [1]])              # too short for a bigram
    draft = np.asarray(lookup_draft(hist, hlen, 3))
    assert (draft == -1).all()


def test_lookup_draft_ignores_stale_region_beyond_hlen():
    row = [4, 6, 1, 2, 3, 4, 6]
    hist, _ = _hist([row + [4, 6, 9, 9, 9]])   # stale garbage past hlen
    hlen = jnp.asarray([len(row)], jnp.int32)
    draft = np.asarray(lookup_draft(hist, hlen, 2))
    np.testing.assert_array_equal(draft[0], [1, 2])  # from the real match


def test_lookup_draft_longest_suffix_wins_over_recent_bigram():
    # suffix ...[1, 2, 3]: the RECENT bigram [2, 3] (-> 9) would mispredict;
    # the older trigram [1, 2, 3] (-> 7) is the right continuation and the
    # n-gram cascade must prefer it ("the gripper must" vs "the gripper to")
    hist, hlen = _hist([[1, 2, 3, 7, 8, 5, 2, 3, 9, 4, 1, 2, 3]])
    draft = np.asarray(lookup_draft(hist, hlen, 2))
    np.testing.assert_array_equal(draft[0], [7, 8])


def test_generate_ids_prepends_prompt_tail_to_draft_context(setup):
    # with draft_context == the exact greedy output, the decode-start
    # boundary (prompt end -> first token) must be draftable: far fewer
    # verifier steps than undrafted, and output still exactly greedy
    cfg, params, tok = setup
    opts = GenerateOptions(eos_id=tok.eos_id)
    pixels = _pixels(cfg, np.random.default_rng(3), 1)
    plain = ServingEngine(cfg, params, tok, options=opts)
    spec = SpeculativeEngine(cfg, params, tok, options=opts, draft_k=6)
    prompt = "In: move the cup\nOut:"
    ref = plain.generate_ids([prompt], pixels, max_new_tokens=24)
    undrafted = spec.generate_ids([prompt], pixels, max_new_tokens=24)
    steps_undrafted = spec.last_steps
    out = spec.generate_ids([prompt], pixels, max_new_tokens=24,
                            draft_context=np.asarray(ref[0], np.int32))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(undrafted))
    # perfect context + boundary tail -> near-minimal steps
    assert spec.last_steps <= max(2, steps_undrafted // 2), (
        spec.last_steps, steps_undrafted)


# ------------------------------------------------------------- end-to-end

def test_speculative_matches_plain_greedy(setup):
    cfg, params, tok = setup
    opts = GenerateOptions(eos_id=tok.eos_id)
    plain = ServingEngine(cfg, params, tok, options=opts)
    spec = SpeculativeEngine(cfg, params, tok, options=opts, draft_k=4)
    rng = np.random.default_rng(0)
    prompts = ["In: do the thing\nOut:",
               "In: a much longer instruction goes right here\nOut:"]
    pixels = _pixels(cfg, rng, 2)
    want = plain.generate_ids(prompts, pixels, max_new_tokens=24)
    got = spec.generate_ids(prompts, pixels, max_new_tokens=24)
    np.testing.assert_array_equal(got, want)
    assert 1 <= spec.last_steps <= 24


def test_speculative_quantized_cache(setup):
    cfg, params, tok = setup
    opts = GenerateOptions(eos_id=tok.eos_id)
    plain = ServingEngine(cfg, params, tok, options=opts, quantized_cache=True)
    spec = SpeculativeEngine(cfg, params, tok, options=opts, draft_k=3,
                             quantized_cache=True)
    rng = np.random.default_rng(1)
    pixels = _pixels(cfg, rng, 1)
    want = plain.generate_ids(["In: y\nOut:"], pixels, max_new_tokens=12)
    got = spec.generate_ids(["In: y\nOut:"], pixels, max_new_tokens=12)
    np.testing.assert_array_equal(got, want)


def test_speculative_accepts_on_periodic_output(setup):
    """Force a perfectly periodic greedy output (zeroed decoder layers +
    one-hot embed/lm_head encoding the transition 5→6→7→5) and check that
    prompt lookup actually accepts drafts: far fewer verifier steps than
    emitted tokens, with the emitted cycle exact."""
    cfg, params, tok = setup
    D, V = cfg.llm.dim, cfg.llm.vocab_size

    def nxt(t):
        return {5: 6, 6: 7, 7: 5}.get(t % D, 5)

    embed = np.zeros((V, D), np.float32)
    embed[np.arange(V), np.arange(V) % D] = 10.0
    lm_head = np.zeros((D, V), np.float32)
    lm_head[np.arange(D), [nxt(d) for d in range(D)]] = 100.0
    llm = jax.tree_util.tree_map(jnp.zeros_like, params["llm"])
    llm = dict(llm, embed=jnp.asarray(embed), lm_head=jnp.asarray(lm_head),
               final_norm=params["llm"]["final_norm"])
    llm["layers"] = dict(llm["layers"],
                         attn_norm=params["llm"]["layers"]["attn_norm"],
                         mlp_norm=params["llm"]["layers"]["mlp_norm"])
    cyc_params = dict(params, llm=llm)

    opts = GenerateOptions(eos_id=tok.eos_id)
    spec = SpeculativeEngine(cfg, cyc_params, tok, options=opts, draft_k=4)
    rng = np.random.default_rng(2)
    prompt = "In: loop\nOut:"
    out = spec.generate_ids([prompt], _pixels(cfg, rng, 1),
                            max_new_tokens=24)[0]
    cur = tok.encode(prompt)[-1]
    expected = []
    for _ in range(24):
        cur = nxt(cur)
        expected.append(cur)
    np.testing.assert_array_equal(out, expected)
    # once the cycle is in history, every step accepts the full k=4 draft
    assert spec.last_steps <= 12, spec.last_steps


def test_rejects_sampling_options(setup):
    cfg, params, tok = setup
    with pytest.raises(ValueError):
        SpeculativeEngine(cfg, params, tok,
                          options=GenerateOptions(temperature=0.7))


def test_speculative_phi_backbone():
    """Per-row cache cursors in the Phi decoder: SpeculativeEngine is a
    drop-in for a Phi-2-style backbone too."""
    import dataclasses

    from emmax_tpu.models.phi import PhiConfig

    base = tiny_vlm_config(vocab_size=512)
    phi = PhiConfig(vocab_size=512, dim=64, n_layers=2, n_heads=4,
                    n_kv_heads=4, hidden_dim=128, max_seq_len=256)
    cfg = dataclasses.replace(base, llm=phi)
    params = init_vlm_params(jax.random.PRNGKey(5), cfg)
    tok = ByteLevelTokenizer(vocab_size=512)
    opts = GenerateOptions(eos_id=tok.eos_id)
    plain = ServingEngine(cfg, params, tok, options=opts)
    spec = SpeculativeEngine(cfg, params, tok, options=opts, draft_k=4)
    rng = np.random.default_rng(6)
    pixels = _pixels(cfg, rng, 2)
    prompts = ["In: phi a\nOut:", "In: phi longer instruction b\nOut:"]
    want = plain.generate_ids(prompts, pixels, max_new_tokens=16)
    got = spec.generate_ids(prompts, pixels, max_new_tokens=16)
    np.testing.assert_array_equal(got, want)


def test_speculative_phi_quantized_cache():
    """Phi cached path with int8 KV: greedy tokens match the bf16-cache
    decode on a confidently-separated tiny model (engine + spec engine)."""
    import dataclasses

    from emmax_tpu.models.phi import PhiConfig

    base = tiny_vlm_config(vocab_size=512)
    phi = PhiConfig(vocab_size=512, dim=64, n_layers=2, n_heads=4,
                    n_kv_heads=4, hidden_dim=128, max_seq_len=256)
    cfg = dataclasses.replace(base, llm=phi)
    params = init_vlm_params(jax.random.PRNGKey(7), cfg)
    tok = ByteLevelTokenizer(vocab_size=512)
    opts = GenerateOptions(eos_id=tok.eos_id)
    rng = np.random.default_rng(8)
    pixels = _pixels(cfg, rng, 1)
    plain_q = ServingEngine(cfg, params, tok, options=opts,
                            quantized_cache=True)
    spec_q = SpeculativeEngine(cfg, params, tok, options=opts, draft_k=3,
                               quantized_cache=True)
    want = plain_q.generate_ids(["In: q phi\nOut:"], pixels,
                                max_new_tokens=12)
    got = spec_q.generate_ids(["In: q phi\nOut:"], pixels, max_new_tokens=12)
    np.testing.assert_array_equal(got, want)


def test_forced_tokens_stream_reproduced_and_acceptance_counted(setup):
    """Teacher-forced verifier stream: output equals the stream, and a
    repetitive stream needs fewer verifier forwards than tokens (real
    prompt-lookup acceptance, independent of the loaded weights)."""
    cfg, params, tok = setup
    pixels = _pixels(cfg, np.random.default_rng(7), 1)
    eng = SpeculativeEngine(cfg, params, tok,
                            options=GenerateOptions(eos_id=tok.eos_id),
                            draft_k=4)
    base = tok.encode("NEXT MOVEMENT: move left; NEXT MOVEMENT: move left; "
                      "NEXT MOVEMENT: move left; NEXT MOVEMENT: move left;")
    n = 24
    out = eng.generate_ids(["In: go\nOut:"], pixels,
                           max_new_tokens=n, forced_tokens=base)
    np.testing.assert_array_equal(out[0][:n], np.asarray(base[:n]))
    assert eng.last_steps < n  # repetition => multi-token steps


def test_vision_cache_hit_reuses_patches(setup):
    from emmax_tpu.serving.engine import VisionCache

    cfg, params, tok = setup
    pixels = _pixels(cfg, np.random.default_rng(8), 1)
    plain = ServingEngine(cfg, params, tok,
                          options=GenerateOptions(eos_id=tok.eos_id))
    ref = plain.generate_ids(["In: go\nOut:"], pixels, max_new_tokens=8)

    vc = VisionCache(threshold=0.0)
    eng = ServingEngine(cfg, params, tok,
                        options=GenerateOptions(eos_id=tok.eos_id),
                        vision_cache=vc)
    out1 = eng.generate_ids(["In: go\nOut:"], pixels, max_new_tokens=8)
    out2 = eng.generate_ids(["In: go\nOut:"], pixels, max_new_tokens=8)
    np.testing.assert_array_equal(out1, ref)
    np.testing.assert_array_equal(out2, ref)
    assert vc.misses == 1 and vc.hits == 1

    # a different frame must miss (exact threshold)
    other = {k: v + 0.5 for k, v in pixels.items()}
    eng.generate_ids(["In: go\nOut:"], other, max_new_tokens=8)
    assert vc.misses == 2


def test_draft_context_cross_frame_acceptance(setup):
    """Seeding the previous frame's output as draft context: output is still
    exact, and when the forced stream matches the context, steps collapse
    (long accepts) vs no context."""
    cfg, params, tok = setup
    pixels = _pixels(cfg, np.random.default_rng(9), 1)
    eng = SpeculativeEngine(cfg, params, tok,
                            options=GenerateOptions(eos_id=tok.eos_id),
                            draft_k=4)
    stream = tok.encode("REASONING: reach the cup\nSUBTASK: approach\n"
                        "NEXT GRIPPER: [104, 98]\nMOVEMENT: xq zj rk vv")
    n = 32
    out_cold = eng.generate_ids(["In: go\nOut:"], pixels, max_new_tokens=n,
                                forced_tokens=stream)
    steps_cold = eng.last_steps
    out_warm = eng.generate_ids(["In: go\nOut:"], pixels, max_new_tokens=n,
                                forced_tokens=stream,
                                draft_context=out_cold[0])
    steps_warm = eng.last_steps
    np.testing.assert_array_equal(out_warm, out_cold)
    # identical previous output => near-full acceptance
    assert steps_warm < steps_cold
    assert steps_warm <= (n + 4) // 5 + 2


def test_prefix_kv_reuse_token_parity(setup):
    """Closed-loop frames with identical patches + prompt prefix: the
    tail-refresh path must produce exactly the tokens of a full prefill."""
    from emmax_tpu.serving.engine import VisionCache

    cfg, params, tok = setup
    pixels = _pixels(cfg, np.random.default_rng(11), 1)
    n = 16

    def prompt(x, y):
        return ("In: What action should the robot take\nINSTRUCTION: \n"
                f"pick up the cup\nCURRENT GRIPPER: [{x:03d}, {y:03d}]\nOut:")

    # reference: fresh engine, full prefill each frame
    ref_eng = SpeculativeEngine(cfg, params, tok,
                                options=GenerateOptions(eos_id=tok.eos_id),
                                draft_k=4)
    ref1 = ref_eng.generate_ids([prompt(104, 98)], pixels, max_new_tokens=n)
    ref2 = ref_eng.generate_ids([prompt(112, 96)], pixels, max_new_tokens=n)

    eng = SpeculativeEngine(cfg, params, tok,
                            options=GenerateOptions(eos_id=tok.eos_id),
                            draft_k=4, prefix_tail=16,
                            vision_cache=VisionCache(threshold=0.0))
    out1 = eng.generate_ids([prompt(104, 98)], pixels, max_new_tokens=n)
    assert eng.last_prefill == "full"
    out2 = eng.generate_ids([prompt(112, 96)], pixels, max_new_tokens=n)
    assert eng.last_prefill == "tail"   # same prefix, coords in the tail
    np.testing.assert_array_equal(out1, ref1)
    np.testing.assert_array_equal(out2, ref2)

    # a prefix-divergent prompt must fall back to a full prefill
    out3 = eng.generate_ids(
        ["In: What action should the robot take\nINSTRUCTION: \n"
         "wipe the table please\nCURRENT GRIPPER: [104, 098]\nOut:"],
        pixels, max_new_tokens=n)
    assert eng.last_prefill == "full"
    ref3 = ref_eng.generate_ids(
        ["In: What action should the robot take\nINSTRUCTION: \n"
         "wipe the table please\nCURRENT GRIPPER: [104, 098]\nOut:"],
        pixels, max_new_tokens=n)
    np.testing.assert_array_equal(out3, ref3)


# ---------------------------------------------------------------- bf16 fence

def test_bf16_oom_risk_detector():
    """Duck-typed leaves sized like real deployments (no allocation)."""
    from emmax_tpu.serving.speculative import _spec_bf16_oom_risk

    class FakeLeaf:
        def __init__(self, nbytes):
            self.size = nbytes // 2
            self.dtype = np.dtype(np.float16)

    def tree(qkv_gb, rest_gb, quantized=False):
        per = FakeLeaf(int(qkv_gb / 3 * 1e9))
        layers = {"wq": {"q8": 0, "scale": 0} if quantized else per,
                  "wk": per, "wv": per, "wo": FakeLeaf(int(rest_gb * 1e9))}
        return {"llm": {"layers": layers}}

    # bf16 7B: ~13.5 GB weights + ~3 GB transposed qkv > 16 GB HBM
    assert _spec_bf16_oom_risk(tree(qkv_gb=3.2, rest_gb=10.3))
    # int8-quantized (dict weights): never fenced
    assert not _spec_bf16_oom_risk(tree(qkv_gb=3.2, rest_gb=10.3,
                                        quantized=True))
    # small models: never fenced
    assert not _spec_bf16_oom_risk(tree(qkv_gb=0.5, rest_gb=1.0))
    # non-llama / empty trees: never fenced
    assert not _spec_bf16_oom_risk({})
    assert not _spec_bf16_oom_risk({"llm": {"layers": {}}})


def test_bf16_fence_falls_back_to_plain_decode(setup, monkeypatch):
    """With the fence tripped, SpeculativeEngine must produce the PLAIN
    engine's exact tokens and record the fallback."""
    import emmax_tpu.serving.speculative as spec_mod

    cfg, params, tok = setup
    rng = np.random.default_rng(5)
    pixels = _pixels(cfg, rng, 1)
    opts = GenerateOptions(temperature=0.0, max_new_tokens=10, eos_id=-1)

    plain = ServingEngine(cfg, params, tok, options=opts)
    want = plain.generate_ids(["In: do the thing\nOut: "], pixels)

    monkeypatch.setattr(spec_mod, "_spec_bf16_oom_risk", lambda p: True)
    fenced = SpeculativeEngine(cfg, params, tok, options=opts, draft_k=4)
    assert fenced._bf16_fallback
    got = fenced.generate_ids(["In: do the thing\nOut: "], pixels)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert fenced.last_prefill == "plain-fallback"
    assert fenced.last_steps is None

    # force_bf16_spec overrides the fence
    forced = SpeculativeEngine(cfg, params, tok, options=opts, draft_k=4,
                               force_bf16_spec=True)
    assert not forced._bf16_fallback
    got2 = forced.generate_ids(["In: do the thing\nOut: "], pixels)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(want))


def test_bf16_fence_refuses_forced_tokens_and_keeps_vision_cache(
        setup, monkeypatch):
    """The fallback cannot honor teacher-forcing (plain decode has none) —
    silently returning free-run tokens would corrupt acceptance stats, so
    it must refuse loudly. The cross-frame vision cache must still be used
    (the fallback fix originally dropped frame_key entirely)."""
    import pytest as _pytest

    import emmax_tpu.serving.speculative as spec_mod
    from emmax_tpu.serving.engine import VisionCache

    cfg, params, tok = setup
    rng = np.random.default_rng(6)
    pixels = _pixels(cfg, rng, 1)
    opts = GenerateOptions(temperature=0.0, max_new_tokens=6, eos_id=-1)
    monkeypatch.setattr(spec_mod, "_spec_bf16_oom_risk", lambda p: True)
    eng = SpeculativeEngine(cfg, params, tok, options=opts, draft_k=4,
                            vision_cache=VisionCache(threshold=0.02))
    with _pytest.raises(ValueError, match="forced_tokens"):
        eng.generate_ids(["In: x\nOut: "], pixels,
                         forced_tokens=np.arange(32, dtype=np.int32))
    frame = np.zeros((32, 32, 3), np.uint8)
    out1 = eng.generate_ids(["In: x\nOut: "], pixels, frame_key=frame)
    assert len(eng.vision_cache.entries) == 1         # encoded + stored
    out2 = eng.generate_ids(["In: x\nOut: "], pixels, frame_key=frame)
    assert eng.vision_cache.hits == 1                 # second frame hit
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


# ------------------------------------------------- LayerSkip self-drafts

def test_layer_draft_matches_plain_greedy(setup):
    """draft_layers>0 swaps prompt lookup for early-exit self-drafts; greedy
    output must stay exactly the plain engine's regardless of how bad the
    truncated model's proposals are (random weights: near-zero accepts)."""
    cfg, params, tok = setup
    opts = GenerateOptions(eos_id=tok.eos_id)
    plain = ServingEngine(cfg, params, tok, options=opts)
    spec = SpeculativeEngine(cfg, params, tok, options=opts, draft_k=4,
                             draft_layers=1)
    rng = np.random.default_rng(5)
    prompts = ["In: do the thing\nOut:",
               "In: a much longer instruction goes right here\nOut:"]
    pixels = _pixels(cfg, rng, 2)
    want = plain.generate_ids(prompts, pixels, max_new_tokens=20)
    got = spec.generate_ids(prompts, pixels, max_new_tokens=20)
    np.testing.assert_array_equal(got, want)
    assert 1 <= spec.last_steps <= 20


def test_layer_draft_quantized_cache_parity(setup):
    cfg, params, tok = setup
    opts = GenerateOptions(eos_id=tok.eos_id)
    plain = ServingEngine(cfg, params, tok, options=opts,
                          quantized_cache=True)
    spec = SpeculativeEngine(cfg, params, tok, options=opts, draft_k=3,
                             draft_layers=1, quantized_cache=True)
    rng = np.random.default_rng(6)
    pixels = _pixels(cfg, rng, 1)
    want = plain.generate_ids(["In: q\nOut:"], pixels, max_new_tokens=10)
    got = spec.generate_ids(["In: q\nOut:"], pixels, max_new_tokens=10)
    np.testing.assert_array_equal(got, want)


def test_layer_draft_accepts_when_early_exit_agrees(setup):
    """With zeroed decoder layers the truncated model IS the full model
    (output depends only on embed/lm_head), so every layer draft must be
    accepted: far fewer verifier steps than emitted tokens."""
    cfg, params, tok = setup
    D, V = cfg.llm.dim, cfg.llm.vocab_size

    def nxt(t):
        return {5: 6, 6: 7, 7: 5}.get(t % D, 5)

    embed = np.zeros((V, D), np.float32)
    embed[np.arange(V), np.arange(V) % D] = 10.0
    lm_head = np.zeros((D, V), np.float32)
    lm_head[np.arange(D), [nxt(d) for d in range(D)]] = 100.0
    llm = jax.tree_util.tree_map(jnp.zeros_like, params["llm"])
    llm = dict(llm, embed=jnp.asarray(embed), lm_head=jnp.asarray(lm_head),
               final_norm=params["llm"]["final_norm"])
    llm["layers"] = dict(llm["layers"],
                         attn_norm=params["llm"]["layers"]["attn_norm"],
                         mlp_norm=params["llm"]["layers"]["mlp_norm"])
    cyc_params = dict(params, llm=llm)

    opts = GenerateOptions(eos_id=tok.eos_id)
    spec = SpeculativeEngine(cfg, cyc_params, tok, options=opts, draft_k=4,
                             draft_layers=1)
    rng = np.random.default_rng(7)
    out = spec.generate_ids(["In: loop\nOut:"], _pixels(cfg, rng, 1),
                            max_new_tokens=20)[0]
    cur = tok.encode("In: loop\nOut:")[-1]
    expected = []
    for _ in range(20):
        cur = nxt(cur)
        expected.append(cur)
    np.testing.assert_array_equal(out, expected)
    # full-k accepts from the FIRST chunk (no history warmup needed, unlike
    # prompt lookup): ceil(20 / (k+1)) = 4 steps
    assert spec.last_steps <= 5, spec.last_steps


def test_layer_draft_hybrid_keeps_lookup_accepts(setup):
    """draft_layers>0 is a HYBRID: prompt lookup still drafts when it fires.
    Random weights make the truncated model's proposals worthless, so a
    repetitive teacher-forced stream only gets multi-token steps if lookup
    stays in the loop — the old pure-LayerSkip semantics ran ~1 token/step
    here."""
    cfg, params, tok = setup
    pixels = _pixels(cfg, np.random.default_rng(11), 1)
    eng = SpeculativeEngine(cfg, params, tok,
                            options=GenerateOptions(eos_id=tok.eos_id),
                            draft_k=4, draft_layers=1)
    base = tok.encode("NEXT MOVEMENT: move left; " * 8)
    n = 72  # > one ~26-byte repeat period, so lookup has history to hit
    out = eng.generate_ids(["In: go\nOut:"], pixels,
                           max_new_tokens=n, forced_tokens=base)
    np.testing.assert_array_equal(out[0][:n], np.asarray(base[:n]))
    # measured 38 steps; pure LayerSkip on random weights runs ~n steps
    assert eng.last_steps <= 48, eng.last_steps


def test_layer_draft_depth_validation(setup):
    cfg, params, tok = setup
    opts = GenerateOptions(eos_id=tok.eos_id)
    spec = SpeculativeEngine(cfg, params, tok, options=opts, draft_k=2,
                             draft_layers=cfg.llm.n_layers)  # == full depth
    rng = np.random.default_rng(8)
    with pytest.raises(ValueError, match="draft_layers"):
        spec.generate_ids(["In: x\nOut:"], _pixels(cfg, rng, 1),
                          max_new_tokens=4)


# ------------------------------------------------------------- warmup

def test_warmup_compiles_full_and_tail_paths(setup):
    """warmup() must exercise exactly the executables the closed loop hits:
    the full runner, the tail runner (prefix_tail), and the ctx-carrying
    variants — and leave the engine prefix-free so frame 0 prefills fully."""
    cfg, params, tok = setup
    eng = SpeculativeEngine(cfg, params, tok,
                            options=GenerateOptions(eos_id=tok.eos_id),
                            draft_k=3, prefix_tail=4)
    warmed = eng.warmup(["In: do the long thing now\nOut:"],
                        max_new_tokens=6, draft_context_len=16)
    kinds = [w[2] for w in warmed]
    assert kinds == ["full", "tail"]
    assert eng._prefix is None
    # a real call after warmup behaves normally (full prefill on frame 0)
    rng = np.random.default_rng(12)
    out = eng.generate_ids(["In: do the long thing now\nOut:"],
                           _pixels(cfg, rng, 1), max_new_tokens=6)
    assert eng.last_prefill == "full"
    assert out.shape == (1, 6)


def test_warmup_base_engine_matrix(setup):
    cfg, params, tok = setup
    eng = ServingEngine(cfg, params, tok,
                        options=GenerateOptions(eos_id=tok.eos_id))
    warmed = eng.warmup(["In: a\nOut:", "In: " + "x " * 40 + "\nOut:"],
                        max_new_tokens=4, batch_sizes=(1, 2))
    assert len(warmed) == 4                      # 2 prompts x 2 batches
    assert {b for b, _ in warmed} == {1, 2}
    buckets = {bk for _, bk in warmed}
    assert len(buckets) == 2                     # two distinct buckets


def test_session_seeded_episode_skips_cold_start(setup):
    """Closed-loop session pattern (bench.py closedloop_session_hz): a new
    episode seeded with the PREVIOUS episode's final output as draft
    context drafts its first frame from that history (here the streams
    repeat across frames, so the whole frame is draftable; on real GCOT
    only the text scaffold is — fresh action bins still crawl) and the
    teacher-forced stream stays exact."""
    from emmax_tpu.serving.engine import VisionCache

    cfg, params, tok = setup
    opts = GenerateOptions(eos_id=tok.eos_id)
    pixels = _pixels(cfg, np.random.default_rng(3), 1)
    frames = [np.full((64, 64, 3), f, np.uint8) for f in range(4)]
    stream = np.asarray(
        tok.encode("move forward 3 steps; close gripper; " * 3)[:24],
        np.int32)
    eng = SpeculativeEngine(cfg, params, tok, options=opts, draft_k=4,
                            vision_cache=VisionCache(capacity=2,
                                                     threshold=0.05),
                            prefix_tail=8)

    def episode(seed):
        prev, steps = seed, []
        for f in range(4):
            out = eng.generate_ids(["In: go\nOut:"], pixels,
                                   max_new_tokens=24, forced_tokens=stream,
                                   draft_context=prev, frame_key=frames[f])
            prev = np.asarray(out[0], np.int32)
            steps.append(eng.last_steps)
        return steps, prev

    s1, last = episode(None)                 # episode 1: cold frame 0
    s2, last2 = episode(last)                # episode 2: seeded from ep 1
    np.testing.assert_array_equal(last2[:24], stream)   # still exact
    assert s2[0] <= max(s1[1:]), (s1, s2)    # seeded frame 0 ≈ warm frame
    assert sum(s2) < sum(s1), (s1, s2)       # no cold-start crawl


# ------------------------------------------------- action-bin stride drafts

def test_action_stride_draft_gating_and_tiling():
    from emmax_tpu.serving.speculative import action_stride_draft
    LO, HI = 100, 110
    bins = [101, 102, 103, 104, 105, 106, 107]
    # row 0: trailing 7 tokens are all bins -> tiled period-7 proposal
    # row 1: text in the trailing window -> no proposal
    # row 2: too short -> no proposal
    hist, hlen = _hist([[9, 8] + bins,
                        [9, 8, 101, 102, 7, 104, 105, 106, 107],
                        [101, 102, 103]], H=16)
    draft = np.asarray(action_stride_draft(hist, hlen, 10, bin_lo=LO,
                                           bin_hi=HI, period=7))
    np.testing.assert_array_equal(draft[0], bins + bins[:3])
    assert (draft[1] == -1).all()
    assert (draft[2] == -1).all()


@pytest.fixture(scope="module")
def setup_actions():
    cfg = tiny_vlm_config(vocab_size=2048)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tok = ByteLevelTokenizer(vocab_size=2048)
    return cfg, params, tok


def _gcot_like_stream(tok, atok, rng, n_actions=6, max_delta=1):
    """Scaffold text + n_actions consecutive 7-bin actions drifting by
    <= max_delta bins per dim (the BridgeV2 smoothness the stride draft
    exploits)."""
    ids = tok.encode("MOVEMENT:\nmove forward 3 steps;\nPOLICIES: ",
                     add_special_tokens=False)
    a = rng.uniform(-0.5, 0.5, size=7)
    width = 2.0 / (atok.n_bins - 1)
    for _ in range(n_actions):
        ids.extend(int(t) for t in atok.encode_to_ids(a))
        a = np.clip(a + rng.integers(-max_delta, max_delta + 1, 7) * width,
                    -1, 1)
    return np.asarray(ids, np.int32)


def test_action_drafts_cut_cold_action_crawl_and_stay_exact(setup_actions):
    """Teacher-forced GCOT-shaped stream whose POLICIES bins drift ±1/dim:
    stride drafts must cut verifier steps well below the undrafted count
    while reproducing the forced stream exactly (greedy exactness)."""
    from emmax_tpu.vla.action_tokenizer import ActionTokenizer

    cfg, params, tok = setup_actions
    atok = ActionTokenizer(tok)
    rng = np.random.default_rng(0)
    stream = _gcot_like_stream(tok, atok, rng)
    n = len(stream)
    opts = GenerateOptions(eos_id=tok.eos_id, max_new_tokens=n)
    pixels = _pixels(cfg, rng, 1)
    prompt = ["In: act\nOut:"]

    def run(action_drafts):
        eng = SpeculativeEngine(cfg, params, tok, options=opts, draft_k=12,
                                action_drafts=action_drafts)
        assert (eng.action_bins is not None) == action_drafts
        out = eng.generate_ids(prompt, pixels, max_new_tokens=n,
                               forced_tokens=stream)
        return np.asarray(out[0][:n]), eng.last_steps

    out_off, steps_off = run(False)
    out_on, steps_on = run(True)
    np.testing.assert_array_equal(out_on, stream)      # exactness
    np.testing.assert_array_equal(out_off, stream)
    # 42 bin tokens undrafted crawl ~1/step; ±0 stride accepts the unchanged
    # dims (1/3 here) as free multi-token runs. The offline simulator
    # (docs/BENCHMARKS.md) predicts ~8 fewer steps on this stream; assert a
    # real cut while leaving headroom for accept-order noise
    assert steps_on <= steps_off - 5, (steps_on, steps_off)


def test_action_drafts_disabled_on_tiny_vocab(setup):
    cfg, params, tok = setup
    eng = SpeculativeEngine(cfg, params, tok,
                            options=GenerateOptions(eos_id=tok.eos_id),
                            action_drafts=True)
    assert eng.action_bins is None


# ---------------------------------------------------- tree verification

def test_tree_meta_topology():
    from emmax_tpu.serving.speculative import _tree_meta
    depth, anc, base, n1 = _tree_meta((3, 2))
    assert n1 == 1 + 3 + 6
    np.testing.assert_array_equal(depth, [0, 1, 1, 1, 2, 2, 2, 2, 2, 2])
    np.testing.assert_array_equal(base, [1, 4])
    # node 5 (second child of first level-1 node) sees root, node 1, itself
    expect = np.zeros(10, bool); expect[[0, 1, 5]] = True
    np.testing.assert_array_equal(anc[5], expect)
    # every node sees itself and the root
    assert anc.diagonal().all() and anc[:, 0].all()


def test_tree_chunk_logits_match_linear_path(setup_actions):
    """Gold property of tree verification: the logits at a tree node must
    equal a LINEAR cached run of that node's ancestor path (same cache,
    same positions). Exercises the chunk_attn_mask plumbing end to end."""
    from emmax_tpu.models.llama import init_kv_cache
    from emmax_tpu.models.vlm import llm_apply
    from emmax_tpu.models.llama import embed_tokens
    from emmax_tpu.serving.speculative import _tree_meta

    cfg, params, tok = setup_actions
    llm = params["llm"]
    B, S = 1, 64
    rng = np.random.default_rng(1)
    # prefill 5 context tokens with per-row cursors
    cache = init_kv_cache(cfg.llm, B, S, dtype=llm["embed"].dtype)
    cache = dict(cache, len=jnp.zeros((B,), jnp.int32),
                 mask=jnp.zeros((B, S), bool))
    ctx = jnp.asarray(rng.integers(4, 200, size=(B, 5)), jnp.int32)
    emb = embed_tokens(llm, ctx)
    pos = jnp.broadcast_to(jnp.arange(5, dtype=jnp.int32), (B, 5))
    _, cache = llm_apply(llm, cfg.llm, emb, positions=pos, kv_cache=cache)

    depth, anc, base, n1 = _tree_meta((2, 2))
    # chunk: root r, level-1 {a, b}, level-2 {c, d} under a, {e, f} under b
    toks = jnp.asarray([[10, 20, 30, 40, 50, 60, 70]], jnp.int32)
    pos_tree = jnp.asarray(depth)[None, :] + 5
    lg_tree, _ = llm_apply(llm, cfg.llm, embed_tokens(llm, toks),
                           positions=pos_tree, kv_cache=cache,
                           chunk_attn_mask=jnp.asarray(anc))
    # linear path root->b->f (slots 0, 2, 6) on a FRESH copy of the cache
    lin = jnp.asarray([[10, 30, 70]], jnp.int32)
    pos_lin = jnp.asarray([[5, 6, 7]], jnp.int32)
    lg_lin, _ = llm_apply(llm, cfg.llm, embed_tokens(llm, lin),
                          positions=pos_lin, kv_cache=cache)
    np.testing.assert_allclose(np.asarray(lg_tree[0, [0, 2, 6]]),
                               np.asarray(lg_lin[0]), rtol=2e-5, atol=2e-5)


def test_tree_engine_free_run_token_identical(setup_actions):
    """Prompt ends in a 7-bin action run, so the FIRST decode step takes the
    tree branch with real (argmax) targets — output, including everything
    decoded after the tree step from the compacted cache, must equal the
    plain engine's greedy stream."""
    from emmax_tpu.vla.action_tokenizer import ActionTokenizer

    cfg, params, tok = setup_actions
    atok = ActionTokenizer(tok)
    rng = np.random.default_rng(2)
    pixels = _pixels(cfg, rng, 1)
    bins = " ".join([])  # suffix_ids carry the bin run
    suffix = [int(t) for t in atok.encode_to_ids(rng.uniform(-0.5, 0.5, 7))]
    opts = GenerateOptions(eos_id=tok.eos_id, max_new_tokens=24)
    prompt = ["In: POLICIES:"]
    plain = ServingEngine(cfg, params, tok, options=opts)
    ref = plain.generate_ids(prompt, pixels, max_new_tokens=24,
                             suffix_ids=suffix)
    for widths in ((5,), (3, 2)):
        spec = SpeculativeEngine(cfg, params, tok, options=opts, draft_k=12,
                                 action_tree=widths)
        assert spec.action_tree == widths
        out = spec.generate_ids(prompt, pixels, max_new_tokens=24,
                                suffix_ids=suffix)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref)), widths


def test_tree_cuts_forced_bin_stream_steps(setup_actions):
    """±1-drift GCOT-shaped stream: tree verification must beat both the
    undrafted and the stride-only step counts, and stay exact."""
    from emmax_tpu.vla.action_tokenizer import ActionTokenizer

    cfg, params, tok = setup_actions
    atok = ActionTokenizer(tok)
    rng = np.random.default_rng(0)
    stream = _gcot_like_stream(tok, atok, rng)
    n = len(stream)
    opts = GenerateOptions(eos_id=tok.eos_id, max_new_tokens=n)
    pixels = _pixels(cfg, rng, 1)
    prompt = ["In: act\nOut:"]

    def run(**kw):
        eng = SpeculativeEngine(cfg, params, tok, options=opts, draft_k=12,
                                **kw)
        out = eng.generate_ids(prompt, pixels, max_new_tokens=n,
                               forced_tokens=stream)
        np.testing.assert_array_equal(np.asarray(out[0][:n]), stream)
        return eng.last_steps

    steps_off = run(action_drafts=False)
    steps_stride = run()
    steps_tree = run(action_tree=(5, 3))
    assert steps_tree < steps_stride < steps_off, (
        steps_tree, steps_stride, steps_off)
    # ±1 drift is fully inside the (5, 3) candidate sets: with 42 bin
    # tokens the tree should land FAR below stride (sim predicts ~2x fewer
    # bin-region steps); keep slack for boundary effects
    assert steps_tree <= steps_off - 15, (steps_tree, steps_off)


def test_tree_with_quantized_cache_exact_and_same_steps(setup_actions):
    """bench.py runs the tree engine with an int8-quantized KV cache: the
    accepted-path compaction must move the k_scale/v_scale rows along with
    k/v. Teacher forcing makes the output exact and the step count
    independent of cache precision — both must match the bf16-cache run."""
    from emmax_tpu.vla.action_tokenizer import ActionTokenizer

    cfg, params, tok = setup_actions
    atok = ActionTokenizer(tok)
    rng = np.random.default_rng(4)
    stream = _gcot_like_stream(tok, atok, rng)
    n = len(stream)
    opts = GenerateOptions(eos_id=tok.eos_id, max_new_tokens=n)
    pixels = _pixels(cfg, rng, 1)

    def run(quantized):
        eng = SpeculativeEngine(cfg, params, tok, options=opts, draft_k=12,
                                action_tree=(5, 3),
                                quantized_cache=quantized)
        out = eng.generate_ids(["In: act\nOut:"], pixels, max_new_tokens=n,
                               forced_tokens=stream)
        np.testing.assert_array_equal(np.asarray(out[0][:n]), stream)
        return eng.last_steps

    assert run(True) == run(False)


def test_adaptive_tree_switches_on_acceptance(setup_actions):
    """adaptive_tree: a degenerate (random, undraftable) forced stream must
    flip the engine onto the linear executable for the NEXT frame; a
    well-drafted stream must flip it back. Tokens stay exact throughout
    (both variants are exact greedy)."""
    from emmax_tpu.vla.action_tokenizer import ActionTokenizer

    cfg, params, tok = setup_actions
    atok = ActionTokenizer(tok)
    rng = np.random.default_rng(9)
    pixels = _pixels(cfg, rng, 1)
    n = 64
    opts = GenerateOptions(eos_id=tok.eos_id, max_new_tokens=n)
    eng = SpeculativeEngine(cfg, params, tok, options=opts, draft_k=8,
                            action_tree=(5, 3), adaptive_tree=True)
    assert eng.adaptive_tree and eng._tree_live

    # frame 1: random ids outside every draft source -> acceptance ~1
    junk = np.asarray(rng.integers(4, 200, size=n), np.int32)
    out = eng.generate_ids(["In: act\nOut:"], pixels, max_new_tokens=n,
                           forced_tokens=junk)
    np.testing.assert_array_equal(np.asarray(out[0][:n]), junk)
    assert eng.last_tree is True          # frame 1 itself ran the tree
    assert eng._tree_live is False        # ...and demoted the next frame

    # frame 2: same junk again, now on the linear executable — exactness
    # must hold there too, and acceptance stays ~1 -> stays linear
    out = eng.generate_ids(["In: act\nOut:"], pixels, max_new_tokens=n,
                           forced_tokens=junk)
    np.testing.assert_array_equal(np.asarray(out[0][:n]), junk)
    assert eng.last_tree is False and eng._tree_live is False

    # frame 3: a draftable stream with the previous output as context ->
    # high acceptance -> promotes the tree back for frame 4
    stream = _gcot_like_stream(tok, atok, rng)
    m = len(stream)
    eng.generate_ids(["In: act\nOut:"], pixels, max_new_tokens=m,
                     forced_tokens=stream, draft_context=stream)
    assert eng.last_tree is False and eng._tree_live is True


def test_adaptive_tree_token_parity_with_static_engines(setup_actions):
    """Adaptive engine free-running greedy output must equal both static
    engines' outputs regardless of which executable serves the frame."""
    cfg, params, tok = setup_actions
    rng = np.random.default_rng(11)
    pixels = _pixels(cfg, rng, 1)
    opts = GenerateOptions(eos_id=tok.eos_id, max_new_tokens=24)
    prompt = ["In: POLICIES:"]

    ref_tree = SpeculativeEngine(cfg, params, tok, options=opts, draft_k=8,
                                 action_tree=(5, 3)).generate_ids(
        prompt, pixels, max_new_tokens=24)
    ref_lin = SpeculativeEngine(cfg, params, tok, options=opts,
                                draft_k=8).generate_ids(
        prompt, pixels, max_new_tokens=24)
    np.testing.assert_array_equal(np.asarray(ref_tree), np.asarray(ref_lin))

    eng = SpeculativeEngine(cfg, params, tok, options=opts, draft_k=8,
                            action_tree=(5, 3), adaptive_tree=True)
    out1 = eng.generate_ids(prompt, pixels, max_new_tokens=24)
    eng._tree_live = False                # force the linear executable
    out2 = eng.generate_ids(prompt, pixels, max_new_tokens=24)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(ref_tree))
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(ref_tree))
