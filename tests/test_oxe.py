"""OXE registry: standardize transforms (graph mode), configs, mixtures."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from emmax_tpu.data import oxe
from emmax_tpu.data.normalization import rel2abs_gripper_actions


def _through_graph(fn, traj):
    """Apply a standardize fn inside tf.data (graph mode) — the real context."""
    ds = tf.data.Dataset.from_tensors(traj).map(fn)
    return next(iter(ds.as_numpy_iterator()))


def _rt1_style_traj(T=6, world_dim=3):
    rng = np.random.default_rng(0)
    return {
        "action": {
            "world_vector": tf.constant(rng.normal(size=(T, world_dim)),
                                        tf.float32),
            "rotation_delta": tf.constant(rng.normal(size=(T, 3)), tf.float32),
            "gripper_closedness_action": tf.constant(
                [[0.0], [1.0], [0.0], [-1.0], [0.0], [1.0]], tf.float32),
        },
        "observation": {
            "natural_language_instruction": tf.constant(["x"] * T),
        },
    }


def test_rt1_rel2abs_matches_numpy_reference():
    traj = _rt1_style_traj()
    out = _through_graph(oxe.rt1, traj)
    assert out["action"].shape == (6, 7)
    want = rel2abs_gripper_actions(
        np.array([0.0, 1.0, 0.0, -1.0, 0.0, 1.0]))
    np.testing.assert_allclose(out["action"][:, -1], want)
    assert out["language_instruction"][0] == b"x"


def test_rel2abs_all_noop_defaults_open():
    g = oxe.tf_rel2abs_gripper(tf.zeros((5,))).numpy()
    np.testing.assert_array_equal(g, np.ones(5))


def test_jaco_pads_rotation_with_zeros():
    T = 6
    traj = _rt1_style_traj(T)
    traj["observation"]["end_effector_cartesian_pos"] = tf.constant(
        np.random.default_rng(1).normal(size=(T, 7)), tf.float32)
    out = _through_graph(oxe.jaco_play, traj)
    assert out["action"].shape == (T, 7)
    np.testing.assert_array_equal(out["action"][:, 3:6], np.zeros((T, 3)))
    assert out["observation"]["state_eef"].shape == (T, 6)


def test_viola_inverts_and_clips_scalar_gripper():
    T = 4
    traj = {
        "action": {
            "world_vector": tf.zeros((T, 3)),
            "rotation_delta": tf.zeros((T, 3)),
            "gripper_closedness_action": tf.constant([-1.0, 0.0, 0.5, 1.0]),
        },
        "observation": {"natural_language_instruction": tf.constant(["y"] * T)},
    }
    out = _through_graph(oxe.viola, traj)
    np.testing.assert_allclose(out["action"][:, -1], [1.0, 1.0, 0.5, 0.0])


def test_kuka_zlib_state_decode():
    import zlib

    T = 3
    eef = np.arange(T * 7, dtype=np.float32).reshape(T, 7)
    grip = np.zeros((T, 1), np.float32)
    traj = _rt1_style_traj(T)
    traj["action"]["gripper_closedness_action"] = tf.constant(
        [[1.0], [0.0], [-1.0]], tf.float32)
    traj["observation"]["clip_function_input/base_pose_tool_reached"] = \
        tf.constant([zlib.compress(eef[i].tobytes()) for i in range(T)])
    traj["observation"]["gripper_closed"] = tf.constant(
        [zlib.compress(grip[i].tobytes()) for i in range(T)])
    out = _through_graph(oxe.kuka, traj)
    np.testing.assert_allclose(
        out["observation"]["clip_function_input/base_pose_tool_reached"], eef)
    assert out["action"].shape == (T, 7)


def test_quat_to_euler_matches_scipy():
    scipy_tf = pytest.importorskip("scipy.spatial.transform")
    rng = np.random.default_rng(2)
    q = rng.normal(size=(8, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    got = oxe.tf_quat_to_euler(tf.constant(q, tf.float32)).numpy()
    want = scipy_tf.Rotation.from_quat(q).as_euler("xyz")
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_furniture_bench_quat_action():
    T = 5
    rng = np.random.default_rng(3)
    q = rng.normal(size=(T, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    a = np.concatenate([rng.normal(size=(T, 3)), q,
                        np.array([[0.0], [1.0], [0.2], [1.0], [0.0]])], 1)
    traj = {"action": tf.constant(a, tf.float32),
            "observation": {"state": tf.constant(rng.normal(size=(T, 10)),
                                                 tf.float32)}}
    out = _through_graph(oxe.furniture_bench, traj)
    assert out["action"].shape == (T, 7)
    # gripper inverted+clipped: 0→1, 1→0
    np.testing.assert_allclose(out["action"][:, -1], [1.0, 0.0, 0.8, 0.0, 1.0])
    assert out["observation"]["state"].shape == (T, 8)


def test_language_table_unicode_decode_and_pad():
    T = 2
    text = "move left"
    codes = np.zeros((T, 20), np.int32)
    codes[:, :len(text)] = [ord(c) for c in text]
    traj = {"action": tf.constant(np.ones((T, 2)), tf.float32),
            "observation": {"instruction": tf.constant(codes)}}
    out = _through_graph(oxe.language_table, traj)
    assert out["action"].shape == (T, 7)
    np.testing.assert_array_equal(out["action"][:, -1], [1.0, 1.0])  # open
    assert out["language_instruction"][0] == text.encode()


def test_bridge_oxe_drops_first_and_relabels():
    T = 5
    rng = np.random.default_rng(4)
    state = rng.normal(size=(T, 7)).astype(np.float32)
    traj = {
        "action": {
            "world_vector": tf.zeros((T, 3)),
            "rotation_delta": tf.zeros((T, 3)),
            "open_gripper": tf.constant([True] * T),
        },
        "observation": {
            "state": tf.constant(state),
            "natural_language_instruction": tf.constant(["z"] * T),
        },
        "traj_metadata": {"episode_id": tf.constant(7)},
    }
    out = _through_graph(oxe.bridge_oxe, traj)
    # drop first step, then relabel drops the last: T-2 frames
    assert out["action"].shape == (T - 2, 7)
    # movement = reached-state deltas of the post-drop states
    np.testing.assert_allclose(out["action"][:, :6],
                               state[2:, :6] - state[1:-1, :6], atol=1e-6)
    assert out["traj_metadata"]["episode_id"] == 7


def test_registry_and_configs_aligned():
    # every config has a transform; transforms may have a few extras
    # (ppgm* — the reference registry also lacks configs for those)
    extras = set(oxe.OXE_STANDARDIZATION_TRANSFORMS) - set(oxe.OXE_DATASET_CONFIGS)
    assert extras <= {"ppgm", "ppgm_static", "ppgm_wrist"}
    assert set(oxe.OXE_DATASET_CONFIGS) <= set(oxe.OXE_STANDARDIZATION_TRANSFORMS)
    assert len(oxe.OXE_STANDARDIZATION_TRANSFORMS) >= 60
    # every mixture member resolves
    for name, spec in oxe.OXE_NAMED_MIXTURES.items():
        for ds_name, w in spec:
            assert ds_name in oxe.OXE_DATASET_CONFIGS, (name, ds_name)
            assert w > 0


def test_make_oxe_dataset_kwargs_contract(tmp_path):
    kw = oxe.make_oxe_dataset_kwargs("bridge_orig", tmp_path)
    assert kw["action_normalization_mask"] == [True] * 6 + [False]
    assert kw["absolute_action_mask"] == [False] * 6 + [True]
    assert kw["image_obs_keys"] == {"primary": "image_0"}
    assert kw["language_key"] == "language_instruction"
    assert callable(kw["standardize_fn"])
    # joint-action datasets are rejected
    with pytest.raises(ValueError):
        oxe.make_oxe_dataset_kwargs("roboset", tmp_path)


def test_mixture_kwargs_skips_unloadable(tmp_path):
    spec = oxe.OXE_NAMED_MIXTURES["oxe_magic_soup_plus"]
    with pytest.warns(UserWarning):
        kwargs, weights = oxe.get_oxe_dataset_kwargs_and_weights(
            tmp_path, spec + [("roboset", 1.0)])
    assert len(kwargs) == len(weights) == len(spec)
    assert kwargs[0]["name"] == "fractal20220817_data"


def test_rlds_pipeline_uses_oxe_registry(tmp_path):
    """make_dataset_from_rlds falls back to the OXE registry for names not in
    the local table — exercised end-to-end over our tfrecord format."""
    from emmax_tpu.data.rlds import make_dataset_from_rlds, write_episodes

    rng = np.random.default_rng(5)
    T = 6
    episodes = [{
        "image_bytes": [tf.io.encode_jpeg(
            rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)).numpy()
            for _ in range(T)],
        "proprio": rng.normal(size=(T, 6)).astype(np.float32),
        # tdroid-format flat action with continuous gripper
        "action": np.concatenate(
            [rng.normal(size=(T, 6)),
             np.array([[1.0], [0.97], [0.4], [0.02], [0.0], [1.0]])],
            1).astype(np.float32),
        "language": "wipe the table",
        "file_path": "tdroid/train/0",
        "episode_id": 0,
    }]
    write_episodes(tmp_path / "tdroid_carrot_in_bowl-train-0.tfrecord",
                   episodes)

    def standardize(traj):  # our parse stores proprio, not cartesian_position
        traj["observation"]["cartesian_position"] = \
            traj["observation"]["proprio"]
        traj["observation"]["gripper_position"] = traj["action"][:, -1:]
        return oxe.tdroid(traj)

    ds, stats = make_dataset_from_rlds(tmp_path, "tdroid_carrot_in_bowl",
                                       "train", standardize_fn=standardize)
    traj = next(iter(ds.as_numpy_iterator()))
    # gripper binarized by the OXE transform
    assert set(np.unique(traj["action"][:, -1])) <= {0.0, 1.0}
    assert traj["observation"]["EEF_state"].shape == (T, 6)


def test_euler_rmat_roundtrip_and_scipy():
    scipy_tf = pytest.importorskip("scipy.spatial.transform")
    rng = np.random.default_rng(6)
    e = rng.uniform(-1.2, 1.2, size=(6, 3))
    R = oxe.tf_euler_to_rmat(tf.constant(e, tf.float32)).numpy()
    want = scipy_tf.Rotation.from_euler("xyz", e).as_matrix()
    np.testing.assert_allclose(R, want, atol=1e-5)
    # and it inverts tf_quat_to_euler
    q = scipy_tf.Rotation.from_euler("xyz", e).as_quat()
    e_back = oxe.tf_quat_to_euler(tf.constant(q, tf.float32)).numpy()
    np.testing.assert_allclose(e_back, e, atol=1e-5)


def test_droid_wrist_frame_velocity():
    scipy_tf = pytest.importorskip("scipy.spatial.transform")
    rng = np.random.default_rng(7)
    T = 5
    vel = rng.normal(size=(T, 6)).astype(np.float32) * 0.3
    pose = rng.normal(size=(T, 6)).astype(np.float32) * 0.5
    got = oxe.tf_velocity_to_wrist_frame(tf.constant(vel),
                                         tf.constant(pose)).numpy()
    assert got.shape == (T, 9)
    R = scipy_tf.Rotation.from_euler("xyz", pose[:, 3:6]).as_matrix()
    dR = scipy_tf.Rotation.from_euler("xyz", vel[:, 3:6]).as_matrix()
    for t in range(T):
        want_t = R[t].T @ vel[t, :3]
        np.testing.assert_allclose(got[t, :3], want_t, atol=1e-5)
        want_rot = R[t].T @ dR[t] @ R[t]
        np.testing.assert_allclose(got[t, 3:].reshape(2, 3),
                                   want_rot[:2], atol=1e-5)


def test_droid_wristact_action_shape():
    T = 4
    rng = np.random.default_rng(8)
    traj = {
        "action_dict": {
            "cartesian_velocity": tf.constant(
                rng.normal(size=(T, 6)), tf.float32),
            "gripper_position": tf.constant(
                rng.uniform(size=(T, 1)), tf.float32),
        },
        "observation": {
            "cartesian_position": tf.constant(
                rng.normal(size=(T, 6)), tf.float32),
            "gripper_position": tf.constant(
                rng.uniform(size=(T, 1)), tf.float32),
        },
    }
    out = _through_graph(oxe.droid_wristact, traj)
    assert out["action"].shape == (T, 10)   # 3 + R6 + gripper
    assert out["observation"]["proprio"].shape == (T, 7)
