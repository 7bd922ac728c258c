"""Hermetic success-rate evaluator (scripts/eval_success_rate.py).

The reference's figure of merit is simulated task success
(``maniskill2_evaluator.py:15-175``); its GT-trajectory-replay debug tool
(``widowx_test_dataset_inference_rollout_gt_traj_in_sim.py``) validates the
env/dataset/action-convention stack by replaying recorded actions. These
tests run the hermetic equivalents end-to-end on the kinematic world.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import eval_success_rate as esr


def test_scripted_oracle_solves_all_tasks(capsys):
    out = esr.main(["--mode", "scripted", "--episodes_per_task", "2"])
    assert out["overall_success_rate"] == 1.0
    assert set(out["per_task"]) == set(esr.TASKS)
    assert capsys.readouterr().out.strip().startswith("{")  # one JSON line


def test_fixture_roundtrip_gt_replay(tmp_path):
    """Expert rollouts written to the RLDS TFRecord layout must replay to
    100% success in freshly built envs — proving storage, parsing, the
    7-DoF action convention, and env determinism agree end to end."""
    pytest.importorskip("tensorflow")
    fx = esr.main(["--mode", "fixture", "--data", str(tmp_path),
                   "--episodes_per_task", "2"])
    assert fx["expert_success_rate"] == 1.0
    assert (tmp_path / esr.FIXTURE_NAME).exists()
    rp = esr.main(["--mode", "gt_replay", "--data", str(tmp_path)])
    assert rp["overall_success_rate"] == 1.0
    assert rp["episodes"] == fx["episodes"] == 2 * len(esr.TASKS)


def test_gt_replay_detects_broken_convention(tmp_path):
    """A sign-flipped action stream (wrong convention) must NOT replay to
    success — the check has teeth."""
    tf = pytest.importorskip("tensorflow")
    from emmax_tpu.data.rlds import _parse_episode, write_episodes

    esr.main(["--mode", "fixture", "--data", str(tmp_path),
              "--episodes_per_task", "1"])
    eps = []
    for raw in tf.data.TFRecordDataset(str(tmp_path / esr.FIXTURE_NAME)):
        traj = _parse_episode(raw)
        acts = traj["action"].numpy()
        acts[:, :3] *= -1.0                      # corrupt translations
        eps.append({"image_bytes": [b"x"] * len(acts),
                    "proprio": traj["observation"]["proprio"].numpy(),
                    "action": acts,
                    "language": traj["task"]["language_instruction"]
                    .numpy().decode(),
                    "file_path": traj["file_path"][0].numpy().decode(),
                    "episode_id": int(traj["episode_id"][0].numpy())})
    write_episodes(tmp_path / esr.FIXTURE_NAME, eps)
    rp = esr.main(["--mode", "gt_replay", "--data", str(tmp_path)])
    assert rp["overall_success_rate"] == 0.0


def test_vla_policy_in_the_loop_emits_metric():
    """Tiny random-weight VLA through the full prompt -> generate ->
    parse -> env pipeline: the evaluator must complete and emit a rate
    (random weights score ~0; the metric plumbing is what's under test)."""
    from emmax_tpu.experiments.kinematic_sim import evaluate_policy

    vla = esr.build_tiny_vla()
    policy = esr.VLAEnvPolicy(vla, max_new_tokens=24)
    out = evaluate_policy(policy, tasks=["widowx_spoon_on_towel"],
                          episodes_per_task=1, max_steps=2)
    assert 0.0 <= out["overall_success_rate"] <= 1.0
    assert "widowx_spoon_on_towel" in out["per_task"]
