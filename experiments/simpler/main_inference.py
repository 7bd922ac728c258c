"""SimplerEnv/ManiSkill2 evaluation CLI.

Counterpart of ``/root/reference/experiments/SimplerEnv-OpenVLA/simpler_env/
main_inference.py`` + ``maniskill2_evaluator.py:15-175``: builds the policy
adapter and runs scored episodes in simulation. The simulator itself
(``simpler_env`` / SAPIEN) is an external dependency — vendored ~16k LoC in
the reference — and is driven through its public ``simpler_env.make`` API
here; without it, ``--dummy true`` exercises the identical adapter loop
against a mock env.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from emmax_tpu.conf import parse_config
from emmax_tpu.experiments.policy import EmmaXSimplerInference
from emmax_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch("simpler-eval")


@dataclass
class SimplerConfig:
    pretrained_checkpoint: Optional[Path] = None
    env_name: str = "widowx_spoon_on_towel"
    policy_setup: str = "widowx_bridge"       # widowx_bridge | google_robot
    sim: str = "simpler"                      # simpler | kinematic
    episodes: int = 10
    max_steps: int = 120
    max_new_tokens: int = 512
    tokenizer_path: Optional[str] = None
    dummy: bool = False
    smoke_test: bool = False


def main(cfg: SimplerConfig) -> None:
    if cfg.smoke_test:
        import jax

        from emmax_tpu.models.vla import EmmaXVLA
        from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
        from emmax_tpu.ops.image import ImageTransformConfig
        from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

        vcfg = tiny_vlm_config(512)
        vla = EmmaXVLA(vcfg, init_vlm_params(jax.random.PRNGKey(0), vcfg),
                       ByteLevelTokenizer(512),
                       {n: ImageTransformConfig(size=v.img_size)
                        for n, v in vcfg.vision})
        cfg.sim = "kinematic"
        cfg.episodes = 1
        cfg.max_steps = 5
        cfg.max_new_tokens = 10
    else:
        from emmax_tpu.models.load import load_vla

        vla = load_vla(cfg.pretrained_checkpoint,
                       tokenizer_path=cfg.tokenizer_path)

    policy = EmmaXSimplerInference(vla, policy_setup=cfg.policy_setup,
                                   max_new_tokens=cfg.max_new_tokens)

    if cfg.dummy:
        rng = np.random.default_rng(0)
        for ep in range(cfg.episodes):
            policy.reset("put the spoon on the towel")
            for t in range(cfg.max_steps):
                img = rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)
                raw, action = policy.step(img, "put the spoon on the towel")
            overwatch.info(f"dummy episode {ep}: ran {cfg.max_steps} steps")
        overwatch.info("dummy run complete (no simulator attached)")
        return

    if cfg.sim == "kinematic":
        # in-image scored benchmark over the kinematic pick-and-place proxy
        # (SAPIEN is external; emmax_tpu/experiments/kinematic_sim.py)
        from emmax_tpu.experiments.kinematic_sim import TASKS, evaluate_policy

        class _FlatPolicy:
            """Adapter: SimplerInference dict actions -> 7-vector."""

            def reset(self, instruction):
                policy.reset(instruction)

            def step(self, image, instruction):
                raw, action = policy.step(image, instruction)
                if isinstance(action, dict):
                    action = np.concatenate(
                        [action["world_vector"], action["rot_axangle"],
                         action["gripper"]])
                return raw, action

        names = ([cfg.env_name] if cfg.env_name in TASKS else list(TASKS))
        report = evaluate_policy(_FlatPolicy(), tasks=names,
                                 episodes_per_task=cfg.episodes,
                                 max_steps=cfg.max_steps)
        for name, rate in report["per_task"].items():
            overwatch.info(f"{name}: success rate {rate:.2%}")
        overwatch.info(
            f"overall success rate: {report['overall_success_rate']:.2%}")
        return

    try:
        import simpler_env
        from simpler_env.utils.env.observation_utils import \
            get_image_from_maniskill2_obs_dict
    except ImportError as e:
        raise ImportError("simpler_env not installed; use --dummy true") from e

    env = simpler_env.make(cfg.env_name)
    successes = 0
    for ep in range(cfg.episodes):
        obs, _ = env.reset()
        instruction = env.get_language_instruction()
        policy.reset(instruction)
        done, truncated, t = False, False, 0
        while not (done or truncated) and t < cfg.max_steps:
            image = get_image_from_maniskill2_obs_dict(env, obs)
            raw, action = policy.step(image, instruction)
            obs, reward, done, truncated, info = env.step(
                np.concatenate([action["world_vector"],
                                action["rot_axangle"], action["gripper"]]))
            t += 1
        successes += int(done)
        overwatch.info(f"episode {ep}: success={bool(done)}")
    overwatch.info(f"success rate: {successes}/{cfg.episodes} "
                   f"= {successes / cfg.episodes:.2%}")


if __name__ == "__main__":
    main(parse_config(SimplerConfig, sys.argv[1:]))
