import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emmax_tpu.data.collators import BatchLoader, collate_train, collate_val
from emmax_tpu.data.gcot import (DATA_MIXES, GCOTDataset, SyntheticFrameSource,
                                 assemble_gcot_text, make_dummy_gcot_items,
                                 parse_image_path)
from emmax_tpu.models.llama import IGNORE_INDEX
from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
from emmax_tpu.ops.image import ImageTransformConfig
from emmax_tpu.vla.action_tokenizer import ActionTokenizer
from emmax_tpu.vla.solver import Solver
from emmax_tpu.vla.tokenizer import ByteLevelTokenizer


@pytest.fixture(scope="module")
def toks():
    tok = ByteLevelTokenizer()
    return tok, ActionTokenizer(tok)


def test_parse_image_path():
    assert parse_image_path("bridge/train/traj_3/im_12.jpg") == (
        "bridge/train/traj_3", 12)


def test_all_data_mixes_assemble(toks):
    tok, at = toks
    item = make_dummy_gcot_items(1)[0]
    for mix in DATA_MIXES:
        prompt, out = assemble_gcot_text(item, mix, at)
        assert isinstance(prompt, str) and isinstance(out, str)
        if "policy" in mix or mix in ("openvla", "pred_all", "no_movement",
                                      "no_position", "no_reason"):
            assert "POLICIES:\n" in out
    # openvla mix strips the gripper position from the prompt
    p_openvla, _ = assemble_gcot_text(item, "openvla", at)
    assert "CURRENT GRIPPER" not in p_openvla
    # movement_only supervises only the movement line
    _, out_mv = assemble_gcot_text(item, "movement_only", at)
    assert out_mv.startswith("MOVEMENT:")


def test_gcot_dataset_train_masking(toks):
    tok, at = toks
    ds = GCOTDataset(make_dummy_gcot_items(4), at, tok,
                     SyntheticFrameSource(64), data_mix="movement_policy",
                     mask_inst=True)
    s = ds[0]
    ids, labels = s["input_ids"], s["labels"]
    assert len(ids) == len(labels)
    n_masked = sum(1 for l in labels if l == IGNORE_INDEX)
    assert 0 < n_masked < len(labels)
    # unmasked tail equals input ids (supervision on the answer)
    tail = [(i, l) for i, l in zip(ids, labels) if l != IGNORE_INDEX]
    assert all(i == l for i, l in tail)
    assert s["image"].dtype == np.uint8


def test_gcot_dataset_val_mode(toks):
    tok, at = toks
    ds = GCOTDataset(make_dummy_gcot_items(2), at, tok,
                     SyntheticFrameSource(64), data_mix="movement_policy",
                     split="val")
    s = ds[0]
    assert isinstance(s["labels"], str)
    assert "POLICIES:" in s["labels"]


def test_collators(toks):
    tok, at = toks
    ds = GCOTDataset(make_dummy_gcot_items(6), at, tok,
                     SyntheticFrameSource(32), data_mix="movement_policy",
                     mask_inst=True)
    batch = collate_train([ds[i] for i in range(3)], tok.pad_id)
    B, L = batch["input_ids"].shape
    assert B == 3 and L % 64 == 0
    assert batch["images"].shape == (3, 32, 32, 3)
    # right padding: invalid positions at the end
    row_valid = batch["attention_mask"][0]
    assert row_valid[0] and not row_valid[-1] or row_valid.all()

    vds = GCOTDataset(make_dummy_gcot_items(3), at, tok,
                      SyntheticFrameSource(32), split="val")
    vbatch = collate_val([vds[i] for i in range(2)], tok.pad_id)
    # left padding: first position of the shorter row is invalid
    lens = [len(vds[i]["input_ids"]) for i in range(2)]
    shorter = int(np.argmin(lens))
    if lens[0] != lens[1]:
        assert not vbatch["attention_mask"][shorter][0]
    assert isinstance(vbatch["labels"][0], str)


def test_batch_loader_sharding(toks):
    tok, at = toks
    ds = GCOTDataset(make_dummy_gcot_items(16), at, tok,
                     SyntheticFrameSource(32))
    l0 = BatchLoader(ds, 2, lambda s: [x["input_ids"][0] for x in s],
                     num_shards=2, shard_index=0, seed=1)
    l1 = BatchLoader(ds, 2, lambda s: [x["input_ids"][0] for x in s],
                     num_shards=2, shard_index=1, seed=1)
    b0 = list(l0.epoch(0))
    b1 = list(l1.epoch(0))
    assert len(b0) == len(b1) == 4


def test_end_to_end_tiny_training_with_checkpoint(tmp_path, toks):
    """Full integration: GCOT data -> collate -> sharded train step with
    on-device image transform -> solver eval -> checkpoint -> resume."""
    from emmax_tpu.parallel import make_mesh, shard_params
    from emmax_tpu.training.checkpointing import CheckpointManager
    from emmax_tpu.training.loop import (LoopConfig, make_eval_fn,
                                         run_discrete_vla_training)
    from emmax_tpu.training.metrics import (JSONLinesTracker,
                                            VLADiscreteMetrics)
    from emmax_tpu.training.train_state import (create_train_state,
                                                make_optimizer)
    from emmax_tpu.training.train_step import jit_train_step, make_train_step

    tok = ByteLevelTokenizer(vocab_size=1024)
    at = ActionTokenizer(tok)
    cfg = tiny_vlm_config(vocab_size=1024)
    transforms = {name: ImageTransformConfig(size=v.img_size)
                  for name, v in cfg.vision}
    ds = GCOTDataset(make_dummy_gcot_items(8), at, tok,
                     SyntheticFrameSource(32), data_mix="movement_policy",
                     mask_inst=True)
    loader = BatchLoader(ds, 4, lambda s: collate_train(s, tok.pad_id,
                                                        pad_multiple=32))
    mesh = make_mesh((1, 8, 1))
    params = shard_params(init_vlm_params(jax.random.PRNGKey(0), cfg), mesh)
    tx, sched = make_optimizer(params, learning_rate=1e-3, weight_decay=0.0,
                               max_grad_norm=1.0,
                               lr_scheduler_type="constant", total_steps=4,
                               stage="vla-full-train")
    state = create_train_state(params, tx)
    step_fn = jit_train_step(make_train_step(
        cfg, tx, remat=True, compute_dtype=jnp.float32,
        transforms=transforms), donate=False)
    metrics = VLADiscreteMetrics([JSONLinesTracker("test", tmp_path)])
    ckpt = CheckpointManager(tmp_path, async_save=False)
    eval_fn = make_eval_fn(cfg, transforms=transforms,
                           compute_dtype=jnp.float32)
    state = run_discrete_vla_training(
        vlm_cfg=cfg, state=state, train_step=step_fn, loader=loader,
        metrics=metrics, loop_cfg=LoopConfig(epochs=1, eval_every=2,
                                             save_every=100, log_every=1),
        mesh=mesh, tokenizer=tok, solver=Solver(at), eval_fn=eval_fn,
        ckpt_manager=ckpt, lr_fn=sched)
    assert int(state.step) == 2  # 8 samples / batch 4
    # epoch-end checkpoint exists and restores (incl. optimizer state)
    latest = ckpt.latest()
    assert latest is not None
    restored = ckpt.restore(jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), state))
    assert int(restored.step) == int(state.step)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]))
    # metrics jsonl was written
    assert (tmp_path / "test.jsonl").exists()