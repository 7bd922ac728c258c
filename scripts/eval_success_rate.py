"""Hermetic policy success-rate evaluator (the SimplerEnv role).

The reference scores policies end-to-end in vendored SAPIEN sims
(``/root/reference/experiments/SimplerEnv-OpenVLA/simpler_env/evaluation/
maniskill2_evaluator.py:15-175``) and validates the stack by replaying
ground-truth dataset trajectories in sim
(``simpler_env/utils/debug/
widowx_test_dataset_inference_rollout_gt_traj_in_sim.py``). SAPIEN is not
in this image; this script produces the same figure of merit — task
success rate — over the deterministic kinematic world
(``emmax_tpu/experiments/kinematic_sim.py``), exercising the identical
policy/adapter/evaluator machinery the real sim would.

Modes (each prints one JSON line):

- ``--mode fixture --data DIR``  roll out the scripted expert, record
  episodes (JPEG frames + proprio + 7-DoF actions + instruction) into the
  repo's RLDS TFRecord layout (``data/rlds.py:write_episodes``) — the
  hermetic stand-in for a converted bridge GT split.
- ``--mode gt_replay --data DIR``  the reference's GT-replay check: read
  the episodes back through the RLDS parser and replay the RECORDED
  actions open-loop in a fresh env (same task + seed); on the expert
  fixture the success rate must be 1.0, proving the storage round-trip,
  the action convention, and the env are mutually consistent.
- ``--mode scripted``  closed-loop oracle through ``evaluate_policy``
  (upper bound / env sanity).
- ``--mode vla``  closed-loop policy-in-the-loop success rate with an
  ``EmmaXVLA`` (``--run_dir`` checkpoint, or a tiny random-weight model
  when omitted — exercises the full prompt -> generate -> Solver -> env
  pipeline; random weights score ~0 by construction).
"""

from __future__ import annotations

import argparse
import io
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from emmax_tpu.experiments.kinematic_sim import (TASKS, KinematicManipEnv,
                                                 ScriptedExpertPolicy,
                                                 evaluate_policy)

FIXTURE_NAME = "kinematic_gt-val-00000.tfrecord"


def _jpeg(img: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def make_fixture(data_dir: Path, episodes_per_task: int, max_steps: int,
                 seed: int) -> dict:
    """Expert rollouts → RLDS episodes. ``episode_id`` carries the env
    seed and ``file_path`` the task name, so gt_replay can reconstruct the
    exact world each trajectory was recorded in."""
    from emmax_tpu.data.rlds import write_episodes

    eps, n_success = [], 0
    for name, task in TASKS.items():
        for ep in range(episodes_per_task):
            env = KinematicManipEnv(task, seed=seed + ep,
                                    max_steps=max_steps)
            policy = ScriptedExpertPolicy(env)
            obs, _ = env.reset()
            frames, proprio, actions = [], [], []
            for _ in range(max_steps):
                _, action = policy.step(obs["image"], task.instruction)
                frames.append(_jpeg(obs["image"]))
                proprio.append(obs["proprio"])
                actions.append(np.asarray(action, np.float32))
                obs, _, done, truncated, info = env.step(action)
                if info["success"] or truncated:
                    break
            n_success += bool(env.success)
            eps.append({"image_bytes": frames,
                        "proprio": np.asarray(proprio, np.float32),
                        "action": np.stack(actions),
                        "language": task.instruction,
                        "file_path": name,
                        "episode_id": seed + ep})
    data_dir.mkdir(parents=True, exist_ok=True)
    write_episodes(data_dir / FIXTURE_NAME, eps)
    return {"mode": "fixture", "episodes": len(eps),
            "expert_success_rate": n_success / len(eps),
            "path": str(data_dir / FIXTURE_NAME)}


def gt_replay(data_dir: Path, max_steps: int) -> dict:
    """Replay recorded actions open-loop in freshly constructed envs —
    the reference's ``..._gt_traj_in_sim.py`` check, hermetic."""
    from emmax_tpu.data.rlds import _parse_episode, _require_tf, tf

    _require_tf()
    ds = tf.data.TFRecordDataset(str(data_dir / FIXTURE_NAME))
    per_task: dict = {}
    for raw in ds:
        traj = _parse_episode(raw)
        name = traj["file_path"][0].numpy().decode()
        seed = int(traj["episode_id"][0].numpy())
        acts = traj["action"].numpy()
        env = KinematicManipEnv(TASKS[name], seed=seed, max_steps=max_steps)
        env.reset()
        for a in acts:
            _, _, done, truncated, info = env.step(a)
            if info["success"] or truncated:
                break
        per_task.setdefault(name, []).append(bool(env.success))
    flat = [v for oks in per_task.values() for v in oks]
    return {"mode": "gt_replay", "episodes": len(flat),
            "overall_success_rate": float(np.mean(flat)),
            "per_task": {k: float(np.mean(v)) for k, v in per_task.items()}}


class VLAEnvPolicy:
    """EmmaXVLA → kinematic-env policy: each decode yields an action chunk
    (``run_bridgev2_eval.py:149-199`` amortization) consumed stepwise; the
    env speaks the BridgeV2 7-DoF delta-EEF convention directly."""

    def __init__(self, vla, max_new_tokens: int = 256) -> None:
        self.vla = vla
        self.max_new_tokens = max_new_tokens
        self.pending: list = []

    def reset(self, instruction: str) -> None:
        self.pending = []

    def step(self, image, instruction: str):
        if not self.pending:
            prompt = self.vla.get_prompt(instruction)
            try:
                actions, _ = self.vla.generate_actions(
                    np.asarray(image, np.uint8), prompt, type="act",
                    max_new_tokens=self.max_new_tokens)
            except Exception:  # untrained models may emit unparseable text
                actions = []
            self.pending = [np.asarray(a, np.float64) for a in actions] or \
                [np.zeros(7)]
        return None, self.pending.pop(0)


def build_tiny_vla():
    import jax

    from emmax_tpu.models.vla import EmmaXVLA
    from emmax_tpu.models.vlm import init_vlm_params, tiny_vlm_config
    from emmax_tpu.ops.image import ImageTransformConfig
    from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

    cfg = tiny_vlm_config(vocab_size=1024)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tok = ByteLevelTokenizer(vocab_size=1024)
    transforms = {name: ImageTransformConfig(size=v.img_size)
                  for name, v in cfg.vision}
    stats = {"bridge_orig": {"action": {
        "q01": [-0.1] * 7, "q99": [0.1] * 7, "mask": [True] * 6 + [False]}}}
    return EmmaXVLA(cfg, params, tok, transforms, norm_stats=stats)


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="scripted",
                    choices=["fixture", "gt_replay", "scripted", "vla"])
    ap.add_argument("--data", default="/tmp/emmax_gt_fixture")
    ap.add_argument("--run_dir", default=None,
                    help="VLA checkpoint dir (vla mode); tiny random if unset")
    ap.add_argument("--episodes_per_task", type=int, default=3)
    ap.add_argument("--max_steps", type=int, default=120)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if args.mode == "fixture":
        out = make_fixture(Path(args.data), args.episodes_per_task,
                           args.max_steps, args.seed)
    elif args.mode == "gt_replay":
        out = gt_replay(Path(args.data), args.max_steps)
    elif args.mode == "scripted":
        env0 = KinematicManipEnv(next(iter(TASKS.values())), seed=args.seed)
        out = evaluate_policy(ScriptedExpertPolicy(env0),
                              episodes_per_task=args.episodes_per_task,
                              max_steps=args.max_steps, seed=args.seed)
        out["mode"] = "scripted"
    else:
        if args.run_dir:
            from emmax_tpu.models.load import load_vla

            vla = load_vla(args.run_dir)
        else:
            vla = build_tiny_vla()
        out = evaluate_policy(VLAEnvPolicy(vla),
                              episodes_per_task=args.episodes_per_task,
                              max_steps=args.max_steps, seed=args.seed)
        out["mode"] = "vla"
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    main()
