"""RLDS pipeline tests over synthetic TFRecord episodes."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from emmax_tpu.data.normalization import (NormalizationType,
                                          binarize_gripper_actions,
                                          compute_statistics, normalize_array,
                                          rel2abs_gripper_actions)
from emmax_tpu.data.rlds import (RLDSFrameSource, apply_frame_transforms,
                                 apply_trajectory_transforms,
                                 flatten_trajectories, load_bridgev2_dataset,
                                 make_dataset_from_rlds, make_single_dataset,
                                 write_episodes)


def _jpeg(rng, size=32):
    img = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
    return tf.io.encode_jpeg(img).numpy()


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("rlds")
    rng = np.random.default_rng(0)
    episodes = []
    for i in range(4):
        T = int(rng.integers(6, 12))
        episodes.append({
            "image_bytes": [_jpeg(rng) for _ in range(T)],
            "proprio": rng.normal(size=(T, 7)).astype(np.float32),
            # gripper dim in [0, 1] with clean open/close for binarize
            "action": np.concatenate(
                [rng.normal(size=(T, 6)), rng.choice([0.0, 1.0], size=(T, 1))],
                axis=1).astype(np.float32),
            "language": f"put the thing {i}",
            "file_path": f"bridge/train/traj{i}",
            "episode_id": i,
        })
    write_episodes(root / "bridge_orig-train-00000.tfrecord", episodes)
    write_episodes(root / "bridge_orig-val-00000.tfrecord", episodes[:2])
    return root


def test_make_dataset_and_statistics(data_dir):
    ds, stats = make_dataset_from_rlds(data_dir, "bridge_orig", "train")
    # statistics span ALL splits (train 4 + val 2; reference uses
    # split="all", dataset.py:210-213, so train/val normalize the same)
    assert stats["num_trajectories"] == 6
    assert len(stats["action"]["q01"]) == 7
    assert stats["action"]["mask"] == [True] * 6 + [False]
    traj = next(iter(ds.as_numpy_iterator()))
    # standardize dropped the first (all-zero-action) step: T-1 frames
    assert traj["action"].shape[1] == 7
    # normalized dims clipped to [-1, 1]
    assert np.abs(traj["action"][:, :6]).max() <= 1.0 + 1e-6
    assert traj["file_path"][0].decode().startswith("bridge/train/")


def test_trajectory_chunking(data_dir):
    ds, _ = make_dataset_from_rlds(data_dir, "bridge_orig", "train")
    ds = apply_trajectory_transforms(ds, window_size=2,
                                     future_action_window_size=3)
    traj = next(iter(ds.as_numpy_iterator()))
    T = traj["action"].shape[0]
    assert traj["action"].shape[1:] == (5, 7)          # w + f = 2 + 3
    assert traj["observation"]["proprio"].shape[1] == 2  # history window
    # last frame's future actions are padded with the final action
    np.testing.assert_array_equal(traj["action"][-1, -1],
                                  traj["action"][-1, -2])


def test_frame_pipeline(data_dir):
    ds, _ = make_single_dataset(data_dir, "bridge_orig", "train",
                                resize=(24, 24))
    frame = next(iter(ds.as_numpy_iterator()))
    assert frame["observation"]["image_primary"].shape == (1, 24, 24, 3)
    assert frame["action"].shape == (1, 7)


def test_bridgev2_trajectory_level_with_join_keys(data_dir):
    ds, _ = load_bridgev2_dataset(data_dir, "train")
    keys = set()
    for traj in ds.as_numpy_iterator():
        keys.add(traj["file_path"][0].decode() + "|"
                 + str(int(traj["episode_id"][0])))
    assert len(keys) == 4


def test_rlds_frame_source(data_dir):
    src = RLDSFrameSource(data_dir, splits=("train",))
    key = next(iter(src.index))
    frame = src.get_frame(key, 0)
    assert frame.shape == (32, 32, 3) and frame.dtype == np.uint8


def test_normalization_math():
    stats = {"min": [-2.0], "max": [2.0], "q01": [-1.0], "q99": [1.0],
             "mean": [0.0], "std": [1.0]}
    x = np.array([[0.5]])
    out = normalize_array(x, stats, NormalizationType.BOUNDS_Q99)
    np.testing.assert_allclose(out, [[0.5]])
    out = normalize_array(np.array([[5.0]]), stats,
                          NormalizationType.BOUNDS_Q99)
    np.testing.assert_allclose(out, [[1.0]])  # clipped
    # degenerate dim → 0
    dg = {"min": [1.0], "max": [1.0], "q01": [1.0], "q99": [1.0]}
    np.testing.assert_allclose(
        normalize_array(np.array([[1.0]]), dg, NormalizationType.BOUNDS), [[0.0]])


def test_gripper_primitives():
    acts = np.array([1.0, 0.97, 0.5, 0.02, 0.0, 0.4, 1.0])
    out = binarize_gripper_actions(acts)
    np.testing.assert_array_equal(out, [1, 1, 0, 0, 0, 1, 1])
    rel = np.array([0.0, -1.0, 0.0, 1.0, 0.0])
    # leading no-op back-filled with the INVERSE of the first command
    # (first command opens → was closed before; reference
    # data_utils.py:155-157)
    np.testing.assert_array_equal(rel2abs_gripper_actions(rel),
                                  [0, 1, 1, 0, 0])


def test_compute_statistics_shapes():
    arrays = [np.random.default_rng(0).normal(size=(5, 3)),
              np.random.default_rng(1).normal(size=(8, 3))]
    stats = compute_statistics(arrays)
    assert stats["num_transitions"] == 13
    assert len(stats["q99"]) == 3


def test_rt1_and_taco_standardize(data_dir):
    from emmax_tpu.data.rlds import (STANDARDIZE_FNS, rt1_style_standardize,
                                     taco_play_style_standardize)

    assert "rt_1" in STANDARDIZE_FNS and "taco_play" in STANDARDIZE_FNS
    T = 6
    traj = {
        "observation": {"proprio": tf.random.normal((T, 7))},
        # relative gripper commands: no-op, close, no-op, open, no-op, close
        "action": tf.concat(
            [tf.random.normal((T, 6)),
             tf.constant([[0.0], [1.0], [0.0], [-1.0], [0.0], [1.0]])], 1),
        "task": {"language_instruction": tf.constant("x")},
    }
    out = rt1_style_standardize(dict(traj))
    grip = out["action"][:, -1].numpy()
    # rel→abs: leading no-op back-filled with the INVERSE of the first
    # command (a close command implies the gripper was OPEN before it —
    # reference data_utils.py:155-161), then the last command carries
    np.testing.assert_array_equal(grip, [1, 0, 0, 1, 1, 0])
    assert out["observation"]["EEF_state"].shape == (T, 6)

    traj2 = {
        "observation": {"proprio": tf.random.normal((T, 7))},
        "action": tf.concat(
            [tf.random.normal((T, 6)),
             tf.constant([[1.7], [-0.3], [0.5], [0.0], [1.0], [0.2]])], 1),
        "task": {"language_instruction": tf.constant("y")},
    }
    out2 = taco_play_style_standardize(dict(traj2))
    g2 = out2["action"][:, -1].numpy()
    assert g2.min() >= 0.0 and g2.max() <= 1.0



def test_tf_rel2abs_matches_numpy():
    """The TF and numpy rel->abs gripper transforms must agree on every
    leading-no-op / first-command combination (the TF backfill silently
    used the first command itself instead of its inverse until round 3)."""
    from emmax_tpu.data.normalization import rel2abs_gripper_actions
    from emmax_tpu.data.rlds import _tf_rel2abs_gripper

    cases = [
        [0.0, 1.0, 0.0, -1.0, 0.0, 1.0],
        [0.0, 0.0, -1.0, 0.0, 1.0, 0.0],
        [1.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        [-1.0, 0.0, 1.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],   # no command at all -> open
    ]
    for case in cases:
        want = rel2abs_gripper_actions(np.asarray(case))
        got = _tf_rel2abs_gripper(tf.constant(case, tf.float32)).numpy()
        np.testing.assert_array_equal(got, want, err_msg=str(case))
