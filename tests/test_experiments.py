"""Robot-eval layer: SE(3) helpers, policy adapters, closed loop with a
mock environment, gripper localization fallback."""

import jax
import numpy as np
import pytest

from emmax_tpu.experiments.gripper import GripperLocator, mask_to_pos_naive
from emmax_tpu.experiments.policy import (EmmaXSimplerInference,
                                          normalize_gripper_action,
                                          run_closed_loop)
from emmax_tpu.experiments.transforms3d import (euler_to_axangle,
                                                euler_to_mat, euler_to_quat,
                                                mat_to_euler, mat_to_pose,
                                                mat_to_quat, pose_to_mat,
                                                quat_to_mat)


def test_rotation_roundtrips():
    rng = np.random.default_rng(0)
    for _ in range(20):
        rpy = rng.uniform(-1.2, 1.2, 3)
        R = euler_to_mat(*rpy)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(mat_to_euler(R), rpy, atol=1e-8)
        q = mat_to_quat(R)
        np.testing.assert_allclose(quat_to_mat(q), R, atol=1e-8)


def test_pose_mat_roundtrip():
    xyz = np.array([0.1, -0.2, 0.3])
    q = euler_to_quat(0.1, 0.2, 0.3)
    T = pose_to_mat(xyz, q)
    xyz2, q2 = mat_to_pose(T)
    np.testing.assert_allclose(xyz2, xyz)
    assert min(np.linalg.norm(q2 - q), np.linalg.norm(q2 + q)) < 1e-8


def test_euler_to_axangle():
    axis, angle = euler_to_axangle(0.0, 0.0, 0.5)
    np.testing.assert_allclose(axis, [0, 0, 1], atol=1e-9)
    assert angle == pytest.approx(0.5)
    axis, angle = euler_to_axangle(0.0, 0.0, 0.0)
    assert angle == pytest.approx(0.0)


def test_normalize_gripper_action():
    a = np.array([0.1, 0.2, 0.3, 0, 0, 0, 1.0])
    out = normalize_gripper_action(a.copy())
    assert out[-1] == 1.0
    out = normalize_gripper_action(np.array([0.0] * 6 + [0.2]))
    assert out[-1] == -1.0


def test_mask_to_pos():
    mask = np.zeros((50, 50), bool)
    mask[30, 40] = True
    x, y = mask_to_pos_naive(mask)
    assert (x, y) == (50, 20)
    assert mask_to_pos_naive(np.zeros((5, 5), bool)) == (0, 0)


def test_gripper_locator_fallback():
    img = np.full((256, 256, 3), 200, np.uint8)
    img[100:110, 150:160] = 0  # dark "gripper"
    x, y = GripperLocator()(img)
    assert 120 <= x <= 150 and 75 <= y <= 105  # within the dark blob, 224-scale


@pytest.fixture(scope="module")
def vla():
    from emmax_tpu.models.vla import EmmaXVLA
    from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
    from emmax_tpu.ops.image import ImageTransformConfig
    from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

    cfg = tiny_vlm_config(512)
    return EmmaXVLA(cfg, init_vlm_params(jax.random.PRNGKey(0), cfg),
                    ByteLevelTokenizer(512),
                    {n: ImageTransformConfig(size=v.img_size)
                     for n, v in cfg.vision})


def test_simpler_adapter_step(vla):
    policy = EmmaXSimplerInference(vla, policy_setup="widowx_bridge",
                                   max_new_tokens=10)
    img = np.random.default_rng(0).integers(0, 256, (128, 128, 3),
                                            dtype=np.uint8)
    raw, action = policy.step(img, "put the spoon on the towel")
    assert set(action) == {"world_vector", "rot_axangle", "gripper",
                           "terminate_episode"}
    assert action["world_vector"].shape == (3,)
    assert action["rot_axangle"].shape == (3,)
    assert action["gripper"] in (-1.0, 1.0)


def test_simpler_adapter_google_sticky(vla):
    policy = EmmaXSimplerInference(vla, policy_setup="google_robot",
                                   max_new_tokens=10,
                                   sticky_gripper_num_repeat=2)
    img = np.zeros((64, 64, 3), np.uint8)
    raw, action = policy.step(img, "pick coke can")
    assert "gripper" in action


class MockEnv:
    def __init__(self, rng):
        self.rng = rng
        self.steps = []

    def get_observation(self):
        return {"full_image": self.rng.integers(0, 256, (128, 128, 3),
                                                dtype=np.uint8)}

    def step(self, action):
        assert action.shape == (7,)
        self.steps.append(action)


def test_closed_loop_with_mock_env(vla):
    env = MockEnv(np.random.default_rng(1))
    log = run_closed_loop(vla, env, "put the pot next to the cans",
                          gripper_locator=GripperLocator(), max_steps=4,
                          max_new_tokens=10)
    assert len(env.steps) >= 1
    assert len(log.actions) == len(env.steps)
    assert all(isinstance(t, str) for t in log.texts)
