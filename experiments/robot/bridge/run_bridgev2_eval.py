"""WidowX BridgeV2 closed-loop evaluation CLI.

Counterpart of ``/root/reference/experiments/robot/bridge/
run_bridgev2_eval.py:34-223``: connect to a WidowX control server, run
episodes at 5 Hz where each ``generate_actions`` decode yields a chunk of
7-DoF actions executed sequentially, with OWL-ViT+SAM gripper localization
feeding the ``CURRENT GRIPPER`` prompt field.

The robot client (``widowx_envs``) is an external network service; when it
is unavailable pass ``--dummy true`` to drive the identical loop against a
mock env (the reference's ``dummy_bridgev2_eval.py`` role).
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

import numpy as np

from emmax_tpu.conf import parse_config
from emmax_tpu.experiments.gripper import GripperLocator, HFDetectorBackend
from emmax_tpu.experiments.policy import run_closed_loop
from emmax_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch("bridge-eval")


@dataclass
class BridgeEvalConfig:
    pretrained_checkpoint: Optional[Path] = None
    host: str = "localhost"
    port: int = 5556
    max_episodes: int = 50
    max_steps: int = 100
    control_frequency: float = 5.0            # run_bridgev2_eval.py:89
    max_new_tokens: int = 512
    action_type: str = "act"                  # act | pos
    speculative: bool = False                 # prompt-lookup greedy decode
    use_detector: bool = False                # OWL-ViT+SAM (downloads)
    dummy: bool = False                       # mock env, no robot
    save_dir: Path = Path("rollouts")
    tokenizer_path: Optional[str] = None
    smoke_test: bool = False


class WidowXEnvAdapter:
    """Adapter over the widowx_envs WidowXClient via ``WidowXGymEnv``
    (reference semantics: obs conversion/proprio padding, blocking
    reset-to-start — ``emmax_tpu/experiments/widowx.py`` ≙
    ``widowx_env.py:30-179``)."""

    def __init__(self, host: str, port: int,
                 init_ee_pos=(0.3, 0.0, 0.15), interactive: bool = True):
        try:
            from widowx_envs.widowx_env_service import (WidowXClient,
                                                        WidowXConfigs)
        except ImportError as e:
            raise ImportError(
                "widowx_envs not installed — this CLI drives a physical "
                "robot server; use --dummy true for the mock loop") from e
        from emmax_tpu.experiments.widowx import WidowXGymEnv

        client = WidowXClient(host=host, port=port)
        client.init(WidowXConfigs.DefaultEnvParams, image_size=256)
        self.env = WidowXGymEnv(client, init_ee_pos=init_ee_pos,
                                blocking=False,
                                input_fn=input if interactive else None)
        self.env.reset()

    def get_observation(self):
        obs = self.env.get_observation()
        out = {"full_image": obs.get("full_image", obs["image_primary"]),
               "proprio": obs["proprio"]}
        if "eef_transform" in obs:   # pos-mode eval needs the EE pose
            out["eef_transform"] = obs["eef_transform"]
        return out

    def step(self, action):
        return self.env.step(action)

    def move(self, goal_mat, gripper, duration=1):
        return self.env.move(goal_mat, gripper, duration=duration)


class DummyEnv:
    """Env-only testing with synthetic frames (``dummy_bridgev2_eval.py``)."""

    def __init__(self, seed: int = 0):
        self.rng = np.random.default_rng(seed)
        self.executed = []

    def get_observation(self):
        return {"full_image": self.rng.integers(0, 256, (256, 256, 3),
                                                dtype=np.uint8)}

    def step(self, action):
        self.executed.append(np.asarray(action))

    def move(self, goal_mat, gripper, duration=1):
        # pos-mode absolute move (dummy_bridgev2_position_eval.py role)
        self.executed.append(("move", np.asarray(goal_mat), gripper))


def main(cfg: BridgeEvalConfig) -> None:
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
                        for n, v in vcfg.vision},
                       speculative=cfg.speculative)
        cfg.dummy = True
        cfg.max_new_tokens = min(cfg.max_new_tokens, 16)
    else:
        from emmax_tpu.models.load import load_vla

        vla = load_vla(cfg.pretrained_checkpoint,
                       tokenizer_path=cfg.tokenizer_path,
                       speculative=cfg.speculative)

    locator = GripperLocator(
        backend=HFDetectorBackend() if cfg.use_detector else None)
    env = DummyEnv() if cfg.dummy else WidowXEnvAdapter(cfg.host, cfg.port)

    cfg.save_dir.mkdir(parents=True, exist_ok=True)
    for ep in range(cfg.max_episodes):
        if cfg.dummy and ep >= 1:
            break
        instruction = ("put the spoon on the towel" if cfg.dummy
                       else input("Enter instruction: ").strip())
        t0 = time.time()
        log = run_closed_loop(vla, env, instruction,
                              gripper_locator=locator,
                              max_steps=cfg.max_steps,
                              max_new_tokens=cfg.max_new_tokens,
                              action_type=cfg.action_type)
        dur = time.time() - t0
        hz = len(log.actions) / max(dur, 1e-9)
        overwatch.info(
            f"episode {ep}: {len(log.actions)} actions in {dur:.1f}s "
            f"({hz:.1f} Hz amortized), {len(log.texts)} decodes")
        np.save(cfg.save_dir / f"episode_{ep}_actions.npy",
                np.asarray(log.actions))
        (cfg.save_dir / f"episode_{ep}_texts.txt").write_text(
            "\n----\n".join(log.texts))
        _save_video(cfg.save_dir / f"episode_{ep}.mp4", log.frames,
                    fps=cfg.control_frequency)


def _save_video(path, frames, fps: float = 5.0) -> None:
    """Rollout mp4 (reference saves episode videos,
    ``bridgev2_utils.py:96+``). Best-effort: codec problems only warn."""
    if not frames:
        return
    try:
        import cv2

        h, w = np.asarray(frames[0]).shape[:2]
        vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             float(fps), (w, h))
        for f in frames:
            vw.write(np.ascontiguousarray(np.asarray(f)[..., ::-1]))
        vw.release()
        overwatch.info(f"saved rollout video -> {path}")
    except Exception as e:  # pragma: no cover
        overwatch.warning(f"video save failed ({e}); frames kept in memory only")


if __name__ == "__main__":
    main(parse_config(BridgeEvalConfig, sys.argv[1:]))
