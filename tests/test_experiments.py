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

    cfg = tiny_vlm_config(1024)
    return EmmaXVLA(cfg, init_vlm_params(jax.random.PRNGKey(0), cfg),
                    ByteLevelTokenizer(1024),
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


# === WidowX env semantics (reference widowx_env.py:30-179) ==================

class _FakeWidowXClient:
    def __init__(self, im_size=4, fail_after=None):
        self.im_size = im_size
        self.calls = []
        self.fail_after = fail_after
        self.n_obs = 0
        self.state = np.arange(7, dtype=np.float64) / 10.0

    def get_observation(self):
        self.n_obs += 1
        if self.fail_after is not None and self.n_obs > self.fail_after:
            return None
        img = np.linspace(0, 1, 3 * self.im_size * self.im_size)
        return {"image": img, "state": self.state,
                "full_image": np.zeros((8, 8, 3), np.uint8),
                "eef_transform": np.eye(4)}

    def step_action(self, action, blocking=False):
        self.calls.append(("step", np.asarray(action), blocking))

    def move(self, transform, duration=1, blocking=False):
        self.calls.append(("move", np.asarray(transform), blocking))

    def move_gripper(self, pos):
        self.calls.append(("gripper", pos))

    def reset(self):
        self.calls.append(("reset",))


def test_widowx_convert_obs_padding_and_image():
    from emmax_tpu.experiments.widowx import convert_obs

    im_size = 4
    img = np.linspace(0, 1, 3 * im_size * im_size)
    state = np.arange(7, dtype=np.float64) / 10.0
    obs = convert_obs({"image": img, "state": state}, im_size)
    # CHW float [0,1] -> HWC uint8
    assert obs["image_primary"].shape == (4, 4, 3)
    assert obs["image_primary"].dtype == np.uint8
    ref = (img.reshape(3, 4, 4).transpose(1, 2, 0) * 255).astype(np.uint8)
    np.testing.assert_array_equal(obs["image_primary"], ref)
    # proprio padded to 8: [state[:6], 0, state[-1]]
    assert obs["proprio"].shape == (8,)
    np.testing.assert_allclose(obs["proprio"][:6], state[:6])
    assert obs["proprio"][6] == 0.0
    assert obs["proprio"][7] == state[-1]


def test_widowx_env_step_and_truncation():
    from emmax_tpu.experiments.widowx import WidowXGymEnv

    client = _FakeWidowXClient(fail_after=1)
    env = WidowXGymEnv(client, im_size=4, blocking=True)
    obs, r, done, truncated, _ = env.step(np.zeros(7))
    assert not truncated and obs["proprio"].shape == (8,)
    # second obs is None -> null obs + truncation (lost connection)
    obs, r, done, truncated, _ = env.step(np.zeros(7))
    assert truncated
    np.testing.assert_array_equal(obs["image_primary"], 0)
    np.testing.assert_array_equal(obs["proprio"], 0)
    assert client.calls[0][2] is True  # blocking step honored


def test_widowx_reset_to_start_blocking_transform():
    from emmax_tpu.experiments.widowx import START_ROTATION, WidowXGymEnv

    client = _FakeWidowXClient()
    prompts = []

    def fake_input(prompt):
        prompts.append(prompt)
        return "0.25" if prompt.startswith("Enter x") else ""

    env = WidowXGymEnv(client, init_ee_pos=(0.3, 0.0, 0.15), im_size=4,
                       input_fn=fake_input)
    obs, _ = env.reset()
    assert client.calls[0] == ("reset",)
    kind, transform, blocking = client.calls[1]
    assert kind == "move"
    # reset-to-start MUST be blocking (widowx_env.py:168-172)
    assert blocking is True
    np.testing.assert_allclose(transform[:3, :3], START_ROTATION)
    # x overridden by the prompt, y/z defaults kept
    np.testing.assert_allclose(transform[:3, 3], [0.25, 0.0, 0.15])
    assert transform[3, 3] == 1.0
    assert len(prompts) == 3
    assert obs["proprio"].shape == (8,)


def test_widowx_move_issues_gripper_command():
    from emmax_tpu.experiments.widowx import WidowXGymEnv

    client = _FakeWidowXClient()
    env = WidowXGymEnv(client, im_size=4, blocking=False)
    env.move(np.eye(4), 0.9)
    kinds = [c[0] for c in client.calls]
    assert kinds == ["move", "gripper"]
    assert client.calls[0][2] is False  # non-blocking move path
    assert client.calls[1][1] == 0.9


# === scored kinematic sim evaluation (maniskill2_evaluator machinery) =======

def test_kinematic_sim_expert_succeeds_random_fails():
    from emmax_tpu.experiments.kinematic_sim import (KinematicManipEnv,
                                                     ScriptedExpertPolicy,
                                                     TASKS, evaluate_policy)

    env = KinematicManipEnv(TASKS["widowx_spoon_on_towel"], seed=0)
    expert = ScriptedExpertPolicy(env)
    report = evaluate_policy(expert, tasks=list(TASKS),
                             episodes_per_task=2, max_steps=120)
    assert report["overall_success_rate"] == 1.0
    assert set(report["per_task"]) == set(TASKS)

    class ZeroPolicy:
        def reset(self, instruction):
            pass

        def step(self, image, instruction):
            return None, np.zeros(7)

    report0 = evaluate_policy(ZeroPolicy(), tasks=["widowx_spoon_on_towel"],
                              episodes_per_task=2, max_steps=30)
    assert report0["overall_success_rate"] == 0.0


def test_kinematic_sim_grasp_and_render_contract():
    from emmax_tpu.experiments.kinematic_sim import KinematicManipEnv, TASKS

    env = KinematicManipEnv(TASKS["widowx_carrot_on_plate"], seed=1,
                            init_noise=0.0)
    obs, info = env.reset()
    assert obs["image"].shape == (128, 128, 3)
    assert info["instruction"] == "put carrot on plate"
    # closing far away must NOT grasp
    obs, _, _, _, info = env.step([0, 0, 0, 0, 0, 0, 0.0])
    assert not info["grasped"]
    # teleport-free approach: drive to the object then close
    for _ in range(40):
        delta = (env.object_pos - env.gripper_pos) / 0.05
        obs, _, _, _, info = env.step([*np.clip(delta, -1, 1), 0, 0, 0, 1.0])
        if np.linalg.norm(env.gripper_pos - env.object_pos) < 0.03:
            break
    obs, _, _, _, info = env.step([0, 0, 0, 0, 0, 0, 0.0])
    assert info["grasped"]
    # grasped object follows the gripper
    env.step([1, 0, 0, 0, 0, 0, 0.0])
    np.testing.assert_allclose(env.object_pos, env.gripper_pos)
    # frames are deterministic given seed
    env2 = KinematicManipEnv(TASKS["widowx_carrot_on_plate"], seed=1,
                             init_noise=0.0)
    obs2, _ = env2.reset()
    env_r = KinematicManipEnv(TASKS["widowx_carrot_on_plate"], seed=1,
                              init_noise=0.0)
    obs_r, _ = env_r.reset()
    np.testing.assert_array_equal(obs2["image"], obs_r["image"])


def test_pose6_roundtrip():
    from emmax_tpu.experiments.transforms3d import mat_to_pose6, pose6_to_mat

    pose = np.array([0.3, -0.1, 0.15, 0.2, -0.4, 1.1])
    back = mat_to_pose6(pose6_to_mat(pose))
    np.testing.assert_allclose(back, pose, atol=1e-9)


def test_run_closed_loop_pos_mode_issues_absolute_move():
    """type="pos": ONE absolute env.move per decode, goal = Δposition +
    current EE pose with rotation zeroed (run_bridgev2_position_eval.py:
    161-179)."""
    from emmax_tpu.experiments.policy import run_closed_loop
    from emmax_tpu.experiments.transforms3d import mat_to_pose6, pose6_to_mat

    delta = np.array([0.01, -0.02, 0.03, 0.0, 0.0, 0.0, 0.9])

    class FakeVLA:
        def generate_actions(self, image, prompt, type="act",
                             max_new_tokens=512):
            assert type == "pos"
            return [delta], "MOVEMENT: ..."

    eef = pose6_to_mat([0.3, 0.0, 0.15, 0.1, 0.2, 0.3])
    moves = []

    class FakeEnv:
        def get_observation(self):
            return {"full_image": np.zeros((8, 8, 3), np.uint8),
                    "eef_transform": eef}

        def move(self, goal_mat, gripper, duration=1):
            moves.append((np.asarray(goal_mat), gripper))

        def step(self, action):
            raise AssertionError("pos mode must not use step()")

    log = run_closed_loop(FakeVLA(), FakeEnv(), "reach", max_steps=2,
                          action_type="pos")
    assert len(moves) == 2 and len(log.actions) == 2
    goal_pose = mat_to_pose6(moves[0][0])
    # rotation zeroed: goal = delta[:3] + current xyz, euler = delta euler
    np.testing.assert_allclose(goal_pose[:3],
                               [0.31, -0.02, 0.18], atol=1e-9)
    np.testing.assert_allclose(goal_pose[3:], 0.0, atol=1e-9)
    assert moves[0][1] == 0.9


def test_run_closed_loop_stops_on_truncation():
    from emmax_tpu.experiments.policy import run_closed_loop

    class FakeVLA:
        def generate_actions(self, image, prompt, type="act",
                             max_new_tokens=512):
            return [np.zeros(7)] * 4, "POLICIES: ..."

    class TruncEnv:
        def __init__(self):
            self.steps = 0

        def get_observation(self):
            return {"full_image": np.zeros((8, 8, 3), np.uint8)}

        def step(self, action):
            self.steps += 1
            truncated = self.steps >= 2   # server dies on the 2nd action
            return ({}, 0, False, truncated, {})

    env = TruncEnv()
    log = run_closed_loop(FakeVLA(), env, "reach", max_steps=10)
    assert env.steps == 2           # remaining chunk NOT issued
    assert len(log.actions) == 2
