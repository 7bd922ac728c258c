"""Goal relabeling / task augmentation / image augmentation tests.

The relabeling transforms are parity-checked against the REFERENCE's own
functions (``prismatic/vla/datasets/rlds/utils/goal_relabeling.py:15``,
``utils/task_augmentation.py:14``, ``traj_transforms.py:84``) imported via
the stub harness from ``test_reference_parity``; randomness is made
deterministic by patching ``tf.random.uniform`` for the reference call and
passing the same draws to ours via the injectable ``rand`` argument.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from emmax_tpu.data.relabeling import (add_pad_mask_dict,
                                       delete_task_conditioning,
                                       uniform_goal_relabel)

T = 9


def _ref_traj():
    """A reference-shaped trajectory: every leaf [T]-leading."""
    return {
        "observation": {
            "image_primary": tf.constant([f"img{i}".encode() for i in range(T)]),
            "proprio": tf.constant(np.arange(T * 7, dtype=np.float32).reshape(T, 7)),
            "timestep": tf.range(T, dtype=tf.int32),
        },
        "task": {
            "language_instruction": tf.constant([b"put the fork"] * T),
        },
        "action": tf.constant(np.random.default_rng(0).normal(size=(T, 7)).astype(np.float32)),
    }


def _assert_tree_equal(a, b, path=""):
    assert set(a.keys()) == set(b.keys()), f"{path}: {a.keys()} vs {b.keys()}"
    for k in a:
        if isinstance(a[k], dict):
            _assert_tree_equal(a[k], b[k], path + "/" + str(k))
        else:
            av, bv = np.asarray(a[k]), np.asarray(b[k])
            assert av.shape == bv.shape, f"{path}/{k}"
            np.testing.assert_array_equal(av, bv, err_msg=f"{path}/{k}")


@pytest.fixture(scope="module")
def ref_mods():
    from test_reference_parity import _install_stubs

    from test_reference_parity import HFStubTokenizer

    from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

    _install_stubs()
    import sys

    import torch
    import transformers
    orig_count = torch.cuda.device_count
    orig_from_pretrained = transformers.AutoTokenizer.from_pretrained
    torch.cuda.device_count = lambda: 1  # conf/vla.py:240 divides by it
    # solver.py:188 builds a Llama tokenizer at import time
    transformers.AutoTokenizer.from_pretrained = (
        lambda *a, **k: HFStubTokenizer(ByteLevelTokenizer()))
    sys.path.insert(0, "/root/reference")
    try:
        import prismatic.vla.datasets.rlds.traj_transforms as ref_traj_tf
        import prismatic.vla.datasets.rlds.utils.goal_relabeling as ref_goal
        import prismatic.vla.datasets.rlds.utils.task_augmentation as ref_task
    finally:
        torch.cuda.device_count = orig_count
        transformers.AutoTokenizer.from_pretrained = orig_from_pretrained
        sys.path.remove("/root/reference")
    return ref_goal, ref_task, ref_traj_tf


def _with_fixed_uniform(monkeypatch, draws):
    """Patch tf.random.uniform to return `draws` (cycling) — the reference
    modules call it once per transform."""
    it = iter(draws)

    def fake_uniform(shape, *a, **k):
        return tf.constant(next(it), tf.float32)

    monkeypatch.setattr(tf.random, "uniform", fake_uniform)


def test_add_pad_mask_dict_parity(ref_mods):
    _, _, ref_traj_tf = ref_mods
    ours = add_pad_mask_dict(_ref_traj())
    theirs = ref_traj_tf.add_pad_mask_dict(_ref_traj())
    _assert_tree_equal(ours, theirs)
    # empty strings marked as padding
    traj = _ref_traj()
    traj["task"]["language_instruction"] = tf.constant([b""] * T)
    out = add_pad_mask_dict(traj)
    assert not np.asarray(out["task"]["pad_mask_dict"]["language_instruction"]).any()


def test_uniform_goal_relabel_parity(ref_mods, monkeypatch):
    ref_goal, _, ref_traj_tf = ref_mods
    u = np.random.default_rng(1).uniform(size=T).astype(np.float32)

    ours = uniform_goal_relabel(add_pad_mask_dict(_ref_traj()),
                                rand=lambda shape: tf.constant(u))
    _with_fixed_uniform(monkeypatch, [u])
    theirs = ref_goal.uniform(ref_traj_tf.add_pad_mask_dict(_ref_traj()))
    _assert_tree_equal(ours, theirs)

    # goals are strictly future states (or the last step)
    goal_ts = np.asarray(ours["task"]["timestep"])
    assert (goal_ts >= np.minimum(np.arange(T) + 1, T - 1)).all()
    assert (goal_ts <= T - 1).all()


def test_delete_task_conditioning_parity(ref_mods, monkeypatch):
    ref_goal, ref_task, ref_traj_tf = ref_mods
    u_goal = np.random.default_rng(2).uniform(size=T).astype(np.float32)
    u_keep = np.random.default_rng(3).uniform(size=T).astype(np.float32)

    def build(mine: bool):
        traj = _ref_traj()
        # mark one transition's language as padding -> must keep images there
        lang = [b"put the fork"] * T
        lang[4] = b""
        traj["task"]["language_instruction"] = tf.constant(lang)
        if mine:
            traj = add_pad_mask_dict(traj)
            traj = uniform_goal_relabel(traj, rand=lambda s: tf.constant(u_goal))
            return delete_task_conditioning(traj, keep_image_prob=0.5,
                                            rand=lambda s: tf.constant(u_keep))
        traj = ref_traj_tf.add_pad_mask_dict(traj)
        traj = ref_goal.uniform(traj)
        return ref_task.delete_task_conditioning(traj, keep_image_prob=0.5)

    ours = build(mine=True)
    _with_fixed_uniform(monkeypatch, [u_goal, u_keep])
    theirs = build(mine=False)
    _assert_tree_equal(ours, theirs)

    # structural checks: exactly one of (goal image, language) per transition
    img_pad = np.asarray(ours["task"]["pad_mask_dict"]["image_primary"])
    lang_pad = np.asarray(ours["task"]["pad_mask_dict"]["language_instruction"])
    assert (img_pad ^ lang_pad).all()
    # the padded-language transition keeps its image
    assert img_pad[4]
    # dropped goal images snap the goal timestep to the final step
    ts = np.asarray(ours["task"]["timestep"])
    assert (ts[~img_pad] == T - 1).all()


def test_delete_task_conditioning_noop_without_images():
    traj = add_pad_mask_dict(_ref_traj())
    out = delete_task_conditioning(dict(traj), keep_image_prob=0.5)
    _assert_tree_equal(out, traj)


# === image augmentation ======================================================

from emmax_tpu.data.augment import (OPENVLA_IMAGE_AUGMENT_KWARGS,
                                    augment_image, random_resized_crop)


def _img(seed=0, size=64):
    rng = np.random.default_rng(seed)
    return tf.constant(rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8))


def test_augment_deterministic_given_seed():
    img = _img()
    seed = tf.constant([3, 11], tf.int32)
    a = augment_image(img, seed, **OPENVLA_IMAGE_AUGMENT_KWARGS)
    b = augment_image(img, seed, **OPENVLA_IMAGE_AUGMENT_KWARGS)
    assert a.dtype == tf.uint8 and a.shape == img.shape
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = augment_image(img, tf.constant([4, 11], tf.int32),
                      **OPENVLA_IMAGE_AUGMENT_KWARGS)
    assert np.abs(np.asarray(a).astype(int) - np.asarray(c).astype(int)).sum() > 0


def test_augment_actually_changes_image():
    img = _img(1)
    out = augment_image(img, tf.constant([7, 9], tf.int32),
                        **OPENVLA_IMAGE_AUGMENT_KWARGS)
    assert np.abs(np.asarray(out).astype(int) - np.asarray(img).astype(int)).mean() > 1


def test_random_resized_crop_identity_at_scale_one():
    img = tf.image.convert_image_dtype(_img(2), tf.float32)
    out = random_resized_crop(img, scale=[1.0, 1.0], ratio=[1.0, 1.0],
                              seed=tf.constant([0, 0], tf.int32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=2e-2)


def test_random_resized_crop_geometry():
    # scale [0.9, 0.9], ratio [1, 1]: output must be a shifted 94.87% window
    # resized back; borders differ from identity for generic offsets
    img = _img(3, size=100)
    out = random_resized_crop(
        tf.image.convert_image_dtype(img, tf.float32),
        scale=[0.9, 0.9], ratio=[1.0, 1.0], seed=tf.constant([5, 6], tf.int32))
    assert out.shape == (100, 100, 3)
    assert 0.0 <= float(tf.reduce_min(out)) and float(tf.reduce_max(out)) <= 1.0


def test_augment_dict_and_positional_kwargs():
    img = _img(4)
    out = augment_image(
        img, tf.constant([1, 2], tf.int32),
        augment_order=["random_resized_crop", "random_brightness"],
        random_resized_crop=dict(scale=[0.95, 1.0], ratio=[0.9, 1.1]),
        random_brightness=[0.1])
    assert out.dtype == tf.uint8 and out.shape == img.shape
    with pytest.raises(ValueError):
        augment_image(img, tf.constant([1, 2], tf.int32),
                      augment_order=["not_an_op"])


# === pipeline wiring =========================================================

def test_frame_transform_augmentation_wiring(tmp_path):
    from emmax_tpu.data.rlds import (apply_frame_transforms,
                                     apply_trajectory_transforms,
                                     flatten_trajectories,
                                     make_dataset_from_rlds, write_episodes)

    rng = np.random.default_rng(0)
    episodes = []
    for i in range(2):
        Tn = 6
        episodes.append({
            "image_bytes": [tf.io.encode_jpeg(rng.integers(
                0, 256, size=(32, 32, 3), dtype=np.uint8)).numpy()
                for _ in range(Tn)],
            "proprio": rng.normal(size=(Tn, 7)).astype(np.float32),
            "action": np.concatenate(
                [rng.normal(size=(Tn, 6)),
                 rng.choice([0.0, 1.0], size=(Tn, 1))], axis=1).astype(np.float32),
            "language": "wipe the table",
            "file_path": f"bridge/train/traj{i}",
            "episode_id": i,
        })
    write_episodes(tmp_path / "bridge_orig-train-00000.tfrecord", episodes)

    ds, _ = make_dataset_from_rlds(tmp_path, "bridge_orig", "train")
    ds = apply_trajectory_transforms(
        ds, train=True, window_size=1, skip_unlabeled=True,
        goal_relabeling_strategy="uniform",
        task_augment_strategy="delete_task_conditioning",
        task_augment_kwargs={"keep_image_prob": 0.5})
    ds = flatten_trajectories(ds)
    plain = apply_frame_transforms(ds, resize=(32, 32), train=False)
    auged = apply_frame_transforms(
        ds, resize=(32, 32), train=True,
        image_augment_kwargs=OPENVLA_IMAGE_AUGMENT_KWARGS)

    f0 = next(iter(plain.as_numpy_iterator()))
    f1 = next(iter(auged.as_numpy_iterator()))
    assert f0["observation"]["image_primary"].shape == (1, 32, 32, 3)
    assert f1["observation"]["image_primary"].dtype == np.uint8
    # goal relabeling added observation-mirroring keys to task
    assert "timestep" in f0["task"]
    # augmentation changes pixel content (same frame ordering both pipelines)
    assert np.abs(f1["observation"]["image_primary"].astype(int)
                  - f0["observation"]["image_primary"].astype(int)).sum() > 0
    # STATELESS seeding: re-iterating the pipeline reproduces the exact
    # augmentation (enumerate-index seed; a stateful tf.random draw under
    # a parallel map broke this)
    f1b = next(iter(auged.as_numpy_iterator()))
    np.testing.assert_array_equal(f1["observation"]["image_primary"],
                                  f1b["observation"]["image_primary"])


def test_rlds_iterable_dataset_with_aug(tmp_path):
    from emmax_tpu.data.rlds import write_episodes
    from emmax_tpu.data.rlds_vla import (RLDSBatchTransform,
                                         RLDSIterableDataset)
    from emmax_tpu.vla.action_tokenizer import ActionTokenizer
    from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

    rng = np.random.default_rng(1)
    Tn = 5
    write_episodes(tmp_path / "bridge_orig-train-00000.tfrecord", [{
        "image_bytes": [tf.io.encode_jpeg(rng.integers(
            0, 256, size=(32, 32, 3), dtype=np.uint8)).numpy()
            for _ in range(Tn)],
        "proprio": rng.normal(size=(Tn, 7)).astype(np.float32),
        "action": np.concatenate(
            [rng.normal(size=(Tn, 6)),
             rng.choice([0.0, 1.0], size=(Tn, 1))], axis=1).astype(np.float32),
        "language": "stack the cups",
        "file_path": "bridge/train/traj0",
        "episode_id": 0,
    }])

    tok = ByteLevelTokenizer()
    transform = RLDSBatchTransform(ActionTokenizer(tok), tok)
    ds = RLDSIterableDataset(tmp_path, "bridge_orig", transform,
                             resize_resolution=(32, 32),
                             shuffle_buffer_size=8, train=True,
                             image_aug=True,
                             goal_relabeling_strategy="uniform")
    sample = next(iter(ds))
    assert sample["image"].shape == (32, 32, 3)
    assert sample["image"].dtype == np.uint8
    assert len(sample["input_ids"]) == len(sample["labels"])
