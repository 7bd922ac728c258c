import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emmax_tpu.models.llama import IGNORE_INDEX
from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
from emmax_tpu.parallel import make_mesh, param_partition_specs, shard_params
from emmax_tpu.parallel.mesh import resolve_mesh_shape, strategy_to_mesh_shape
from emmax_tpu.parallel.sharding import shard_batch
from emmax_tpu.training.train_state import (create_train_state,
                                            make_optimizer,
                                            stage_from_flags, trainable_mask)
from emmax_tpu.training.train_step import jit_train_step, make_train_step


def _make_batch(cfg, rng, B=8, L=12):
    ids = rng.integers(3, cfg.llm.vocab_size, size=(B, L))
    ids[:, 0] = 1
    labels = ids.copy()
    labels[:, :4] = IGNORE_INDEX
    pixels = {name: rng.normal(size=(B, v.img_size, v.img_size, 3))
              .astype(np.float32) for name, v in cfg.vision}
    return {"input_ids": jnp.asarray(ids),
            "attention_mask": jnp.ones((B, L), jnp.bool_),
            "labels": jnp.asarray(labels),
            "pixel_values": {k: jnp.asarray(v) for k, v in pixels.items()}}


def test_mesh_resolution():
    assert resolve_mesh_shape((1, -1, 1), 8) == (1, 8, 1)
    assert resolve_mesh_shape((2, -1, 2), 8) == (2, 2, 2)
    assert strategy_to_mesh_shape("fsdp-full-shard", 8) == (1, 8, 1)
    assert strategy_to_mesh_shape("ddp", 8) == (8, 1, 1)
    assert strategy_to_mesh_shape("fsdp-shard-grad-op", 8, n_hosts=2) == (2, 4, 1)


def test_partition_specs_shard_big_params():
    cfg = tiny_vlm_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh((1, 4, 2))
    specs = param_partition_specs(params, mesh)
    assert specs["llm"]["layers"]["wq"] == jax.sharding.PartitionSpec(
        None, "fsdp", "tensor")
    assert all(e is None for e in specs["llm"]["layers"]["attn_norm"])
    # dims that don't divide fall back to replication on that axis
    for spec, leaf in zip(jax.tree_util.tree_leaves(
            specs, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec)),
            jax.tree_util.tree_leaves(params)):
        for dim, entry in zip(leaf.shape, list(spec)):
            if entry is not None:
                axes = entry if isinstance(entry, tuple) else (entry,)
                size = int(np.prod([mesh.shape[a] for a in axes]))
                assert dim % size == 0


@pytest.mark.parametrize("mesh_shape", [(1, 8, 1), (1, 4, 2), (2, 2, 2)])
def test_sharded_train_step_runs_and_learns(mesh_shape):
    cfg = tiny_vlm_config()
    mesh = make_mesh(mesh_shape)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(params, learning_rate=1e-3, weight_decay=0.0,
                           max_grad_norm=1.0, lr_scheduler_type="constant",
                           total_steps=10, stage="vla-full-train")
    params = shard_params(params, mesh)
    state = create_train_state(params, tx)
    step = jit_train_step(make_train_step(cfg, tx, remat=True,
                                          compute_dtype=jnp.float32))
    rng = np.random.default_rng(0)
    batch = shard_batch(_make_batch(cfg, rng), mesh)
    state, m1 = step(state, batch)
    state, m2 = step(state, batch)
    assert np.isfinite(float(m2["loss"]))
    assert float(m2["loss"]) < float(m1["loss"])  # same batch → must improve
    assert int(state.step) == 2


def test_remat_policies_match_no_remat():
    """remat=True (full activation checkpointing) and remat="dots" (save
    MXU outputs, recompute elementwise only) are pure memory/FLOP trades —
    loss and resulting params must match the no-remat step exactly in f32."""
    cfg = tiny_vlm_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(params, learning_rate=1e-3, weight_decay=0.0,
                           max_grad_norm=1e9, lr_scheduler_type="constant",
                           total_steps=10, stage="vla-full-train")
    rng = np.random.default_rng(3)
    batch = _make_batch(cfg, rng, B=2)
    s0 = create_train_state(params, tx)

    def run(remat):
        fn = jax.jit(make_train_step(cfg, tx, remat=remat,
                                     compute_dtype=jnp.float32))
        s, m = fn(s0, batch)
        return float(m["loss"]), s.params

    loss_none, p_none = run(False)
    for mode in (True, "dots"):
        loss_r, p_r = run(mode)
        assert loss_r == pytest.approx(loss_none, rel=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(p_none),
                        jax.tree_util.tree_leaves(p_r)):
            # remat recompute reorders float ops -> ulp-level grad diffs,
            # which Adam's normalization amplifies; semantic parity is
            # pinned by the exact-loss check above
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=2e-3, atol=1e-4)


def test_scan_weight_barrier_is_identity():
    """The layer-scan weight fence (scan_weight_barrier — stops XLA from
    hoisting full-stack layout-transposed wq/wk/wv copies out of the 7B
    backward loop) must be a pure optimization hint: loss AND grads
    bit-identical with it on or off, in f32 with no remat reordering."""
    from emmax_tpu.models.vlm import vlm_forward

    cfg = tiny_vlm_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    batch = _make_batch(cfg, rng, B=2)

    def loss_fn(p, barrier):
        _, loss, _ = vlm_forward(
            p, cfg, batch["input_ids"], batch["pixel_values"],
            mask=batch["attention_mask"], labels=batch["labels"],
            remat=True, scan_weight_barrier=barrier)
        return loss

    vg = jax.value_and_grad(loss_fn)
    l_off, g_off = jax.jit(lambda p: vg(p, False))(params)
    l_on, g_on = jax.jit(lambda p: vg(p, True))(params)
    assert float(l_on) == float(l_off)
    for a, b in zip(jax.tree_util.tree_leaves(g_off),
                    jax.tree_util.tree_leaves(g_on)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_accumulation_matches_full_batch():
    cfg = tiny_vlm_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(params, learning_rate=1e-3, weight_decay=0.0,
                           max_grad_norm=1e9, lr_scheduler_type="constant",
                           total_steps=10, stage="vla-full-train")
    rng = np.random.default_rng(1)
    batch = _make_batch(cfg, rng, B=4)
    s0 = create_train_state(params, tx)
    full = make_train_step(cfg, tx, remat=False, compute_dtype=jnp.float32)
    accum = make_train_step(cfg, tx, remat=False, compute_dtype=jnp.float32,
                            grad_accum_steps=2)
    s_full, m_full = jax.jit(full)(s0, batch)
    s0b = create_train_state(params, tx)
    s_acc, m_acc = jax.jit(accum)(s0b, batch)
    np.testing.assert_allclose(float(m_full["loss"]), float(m_acc["loss"]),
                               rtol=1e-5)
    a = jax.tree_util.tree_leaves(s_full.params)[3]
    b = jax.tree_util.tree_leaves(s_acc.params)[3]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_trainable_mask_stages():
    cfg = tiny_vlm_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    m = trainable_mask(params, "align")
    assert float(jnp.max(m["llm"]["layers"]["wq"])) == 0.0
    assert float(jnp.min(m["projector"]["layers"][0]["kernel"])) == 1.0
    m = trainable_mask(params, "vla-train")
    assert float(jnp.min(m["llm"]["layers"]["wq"])) == 1.0
    assert float(jnp.max(m["vision"]["dino"]["blocks"]["wqkv"])) == 0.0
    m = trainable_mask(params, "vla-last-layer-train")
    wq = np.asarray(m["llm"]["layers"]["wq"])
    assert wq[-1].min() == 1.0 and wq[:-1].max() == 0.0
    assert float(jnp.min(m["llm"]["embed"])) == 1.0
    assert float(jnp.max(m["projector"]["layers"][0]["kernel"])) == 0.0


def test_stage_from_flags():
    assert stage_from_flags(False, False, False) == "vla-full-train"
    assert stage_from_flags(True, False, False) == "vla-train"
    assert stage_from_flags(True, True, True) == "vla-last-layer-train"
    assert stage_from_flags(False, True, True) == "vla-sandwich-train"


def test_frozen_params_unchanged_after_step():
    cfg = tiny_vlm_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(params, learning_rate=1e-2, weight_decay=0.0,
                           max_grad_norm=1.0, lr_scheduler_type="constant",
                           total_steps=10, stage="vla-train")  # vision frozen
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(cfg, tx, remat=False,
                                   compute_dtype=jnp.float32))
    rng = np.random.default_rng(2)
    before = np.asarray(params["vision"]["dino"]["blocks"]["wqkv"]).copy()
    state, _ = step(state, _make_batch(cfg, rng, B=2))
    after = np.asarray(state.params["vision"]["dino"]["blocks"]["wqkv"])
    np.testing.assert_array_equal(before, after)
    # llm did change
    assert not np.array_equal(
        np.asarray(params["llm"]["layers"]["wq"]),
        np.asarray(state.params["llm"]["layers"]["wq"]))

@pytest.mark.parametrize("remat", [True, "dots"])
@pytest.mark.parametrize("mesh_shape", [(2, 2, 2), (1, 4, 2), (2, 4, 1)])
def test_sharded_step_matches_single_device(mesh_shape, remat):
    """Regression for a real miscompile: `with_sharding_constraint` inside a
    lax.scan body whose scanned-over stacked params are sharded produced
    WRONG values on multi-axis meshes (jax 0.9 CPU, both GSPMD and Shardy;
    loss off by 8e-4 relative, grad norm by 4%). Constraints are now
    anchored on the scan carry BEFORE the scan (models/vit.py, llama.py);
    this pins sharded-vs-single-device train-step parity — for BOTH remat
    policies (True = full, "dots" = save-MXU-outputs), since jax.checkpoint
    wraps exactly the miscompile-prone scan-body region."""
    cfg = tiny_vlm_config()
    rng = np.random.default_rng(0)
    host_batch = _make_batch(cfg, rng)

    def one_step(mesh_shape):
        mesh = make_mesh(mesh_shape,
                         devices=jax.devices()[:int(np.prod(mesh_shape))])
        params = shard_params(init_vlm_params(jax.random.PRNGKey(0), cfg),
                              mesh)
        tx, _ = make_optimizer(params, learning_rate=1e-3, weight_decay=0.0,
                               max_grad_norm=1.0,
                               lr_scheduler_type="constant",
                               total_steps=10, stage="vla-full-train")
        state = create_train_state(params, tx)
        step = jit_train_step(make_train_step(cfg, tx, remat=remat,
                                              compute_dtype=jnp.float32),
                              mesh=mesh)
        batch = shard_batch(host_batch, mesh)
        _, m = step(state, batch)
        return float(m["loss"]), float(m["grad_norm"])

    ref_loss, ref_gnorm = one_step((1, 1, 1))
    loss, gnorm = one_step(mesh_shape)
    np.testing.assert_allclose(loss, ref_loss, rtol=0, atol=5e-5)
    np.testing.assert_allclose(gnorm, ref_gnorm, rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("mesh_shape", [(1, 4, 2)])
def test_grad_accum_under_mesh_matches_single_device(mesh_shape):
    """Gradient accumulation (scan-based) composed with GSPMD sharding:
    the accumulated sharded step must match the single-device full-batch
    step — the accum scan carries grads whose shardings must survive the
    carry (and the scan body holds no sharding constraints, per the
    jax 0.9 miscompile rule pinned above)."""
    cfg = tiny_vlm_config()
    rng = np.random.default_rng(3)
    host_batch = _make_batch(cfg, rng, B=4)

    def one_step(mesh_shape, accum):
        mesh = make_mesh(mesh_shape,
                         devices=jax.devices()[:int(np.prod(mesh_shape))])
        params = shard_params(init_vlm_params(jax.random.PRNGKey(0), cfg),
                              mesh)
        tx, _ = make_optimizer(params, learning_rate=1e-3, weight_decay=0.0,
                               max_grad_norm=1.0,
                               lr_scheduler_type="constant",
                               total_steps=10, stage="vla-full-train")
        state = create_train_state(params, tx)
        step = jit_train_step(
            make_train_step(cfg, tx, remat=True, compute_dtype=jnp.float32,
                            grad_accum_steps=accum), mesh=mesh)
        _, m = step(state, shard_batch(host_batch, mesh))
        return float(m["loss"]), float(m["grad_norm"])

    ref_loss, ref_gnorm = one_step((1, 1, 1), accum=1)
    loss, gnorm = one_step(mesh_shape, accum=2)
    np.testing.assert_allclose(loss, ref_loss, rtol=0, atol=5e-5)
    np.testing.assert_allclose(gnorm, ref_gnorm, rtol=2e-4, atol=1e-5)


def test_freeze_mask_grad_subset_matches_masked_path():
    """make_train_step(freeze_mask=...) must produce the same loss and the
    same parameter updates as the plain masked path, while never
    differentiating fully-frozen leaves (align: only the projector trains;
    at 7B the plain path materializes a 13.5 GB gradient tree — this is
    the memory fix's correctness gate)."""
    cfg = tiny_vlm_config()
    rng = np.random.default_rng(0)
    batch = _make_batch(cfg, rng, B=4)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(params, learning_rate=1e-3, weight_decay=0.0,
                           max_grad_norm=1.0, lr_scheduler_type="constant",
                           total_steps=10, stage="align")
    from emmax_tpu.training.train_state import trainable_mask

    def run(freeze_mask):
        # fresh arrays per run: jit_train_step donates the state, which
        # deletes the shared param buffers after the first step
        state = create_train_state(
            init_vlm_params(jax.random.PRNGKey(0), cfg), tx)
        step = jit_train_step(make_train_step(
            cfg, tx, remat=False, compute_dtype=jnp.float32,
            stop_vision_gradient=True, freeze_mask=freeze_mask))
        new_state, m = step(state, batch)
        return new_state, float(m["loss"]), float(m["grad_norm"])

    s_plain, loss_plain, g_plain = run(None)
    s_sub, loss_sub, g_sub = run(trainable_mask(params, "align"))
    np.testing.assert_allclose(loss_sub, loss_plain, rtol=1e-6)
    # the reported grad_norm differs BY DESIGN: the plain path measures raw
    # pre-mask grads (incl. frozen llm), the subset path only what trains;
    # the update contract below is the equivalence that matters
    assert g_sub > 0.0 and g_plain >= g_sub
    # identical updated projector params; identical (unchanged) llm params
    np.testing.assert_allclose(
        np.asarray(s_sub.params["projector"]["layers"][0]["kernel"]),
        np.asarray(s_plain.params["projector"]["layers"][0]["kernel"]),
        rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(s_sub.params["llm"]["layers"]["wq"]),
        np.asarray(params["llm"]["layers"]["wq"]))


def test_frozen_params_not_decayed():
    """Weight decay must not touch frozen elements of PARTIALLY trainable
    leaves: a stacked-layer leaf with one trainable layer is labeled
    'train' for adamw, whose add_decayed_weights reads PARAMS (not the
    masked grads) — without the trailing update mask the frozen layers
    decayed by lr*wd*|w| every step (review round 3)."""
    cfg = tiny_vlm_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(params, learning_rate=1e-2, weight_decay=0.1,
                           max_grad_norm=1.0, lr_scheduler_type="constant",
                           total_steps=10, stage="vla-last-layer-train")
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(cfg, tx, remat=False,
                                   compute_dtype=jnp.float32))
    rng = np.random.default_rng(3)
    before = np.asarray(params["llm"]["layers"]["wq"]).copy()
    state, _ = step(state, _make_batch(cfg, rng, B=2))
    after = np.asarray(state.params["llm"]["layers"]["wq"])
    np.testing.assert_array_equal(before[:-1], after[:-1])  # frozen layers
    assert not np.array_equal(before[-1], after[-1])        # last trains
    # fully frozen leaf with decayable shape (vision tower weight)
    v_before = np.asarray(params["vision"]["dino"]["blocks"]["wqkv"])
    v_after = np.asarray(state.params["vision"]["dino"]["blocks"]["wqkv"])
    np.testing.assert_array_equal(v_before, v_after)


def test_grad_accum_keeps_frozen_leaves_scalar_in_carry():
    """With freeze_mask + grad_accum_steps > 1, the accumulator must mirror
    grad_fn's scalar placeholders for frozen leaves — a zeros_like init
    broadcast them back to param shape in the scan CARRY, re-materializing
    the frozen-gradient tree the subset-differentiation path exists to
    avoid (13.5 GB at 7B). Checked structurally on the scan carry avals,
    plus numerical parity with the unaccumulated step."""
    cfg = tiny_vlm_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    mask = trainable_mask(params, "vla-train")        # vision frozen
    tx, _ = make_optimizer(params, learning_rate=1e-3, weight_decay=0.0,
                           max_grad_norm=1e9, lr_scheduler_type="constant",
                           total_steps=10, stage="vla-train")
    rng = np.random.default_rng(4)
    batch = _make_batch(cfg, rng, B=4)
    accum = make_train_step(cfg, tx, remat=False, compute_dtype=jnp.float32,
                            grad_accum_steps=2, freeze_mask=mask)
    s0 = create_train_state(params, tx)
    jaxpr = jax.make_jaxpr(accum)(s0, batch)
    scan_eqns = [e for e in jaxpr.eqns if e.primitive.name == "scan"]
    assert scan_eqns, "accum step should lower to a lax.scan"
    frozen_shape = tuple(params["vision"]["dino"]["blocks"]["wqkv"].shape)
    for eqn in scan_eqns:
        nc, nk = eqn.params["num_consts"], eqn.params["num_carry"]
        carry_shapes = [tuple(v.aval.shape)
                        for v in eqn.invars[nc:nc + nk]]
        assert frozen_shape not in carry_shapes, carry_shapes
    # numerical parity with the single step
    single = make_train_step(cfg, tx, remat=False,
                             compute_dtype=jnp.float32, freeze_mask=mask)
    s_a, m_a = jax.jit(accum)(create_train_state(params, tx), batch)
    s_s, m_s = jax.jit(single)(create_train_state(params, tx), batch)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_s["loss"]),
                               rtol=1e-5)
    wq_a = np.asarray(s_a.params["llm"]["layers"]["wq"])
    wq_s = np.asarray(s_s.params["llm"]["layers"]["wq"])
    np.testing.assert_allclose(wq_a, wq_s, atol=1e-5)
    v_a = np.asarray(s_a.params["vision"]["dino"]["blocks"]["wqkv"])
    np.testing.assert_array_equal(
        v_a, np.asarray(params["vision"]["dino"]["blocks"]["wqkv"]))


@pytest.mark.parametrize("ce_chunk", [5, 128])
def test_chunked_ce_matches_full_logits(ce_chunk):
    """chunked_ce_loss_and_preds is a pure memory trade: loss, metrics, and
    one optimizer step must match the full-logits path (f32, CPU). chunk=5
    does not divide the fused length (padding path); 128 exceeds it
    (single-block path)."""
    cfg = tiny_vlm_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(params, learning_rate=1e-3, weight_decay=0.0,
                           max_grad_norm=1e9, lr_scheduler_type="constant",
                           total_steps=10, stage="vla-full-train")
    rng = np.random.default_rng(5)
    batch = _make_batch(cfg, rng, B=2)
    s0 = create_train_state(params, tx)

    def run(chunk):
        fn = jax.jit(make_train_step(cfg, tx, remat=False,
                                     compute_dtype=jnp.float32,
                                     ce_chunk=chunk))
        s, m = fn(s0, batch)
        return m, s.params

    m_full, p_full = run(None)
    m_lean, p_lean = run(ce_chunk)
    assert float(m_lean["loss"]) == pytest.approx(float(m_full["loss"]),
                                                  rel=1e-6)
    for k in ("action_accuracy", "action_l1", "grad_norm"):
        assert float(m_lean[k]) == pytest.approx(float(m_full[k]), rel=1e-5), k
    for a, b in zip(jax.tree_util.tree_leaves(p_full),
                    jax.tree_util.tree_leaves(p_lean)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-3, atol=1e-4)
