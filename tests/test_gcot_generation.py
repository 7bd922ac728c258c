"""GCOT generation pipeline: segmentation → plans → assembly → training JSON."""

import math

import numpy as np
import pytest

from emmax_tpu.gcot.assemble import (RawSample, assemble_dataset,
                                     normalize_movement)
from emmax_tpu.gcot.plans import (HeuristicAnnotator, annotate_with_retries,
                                  generate_plans, validate_plan)
from emmax_tpu.gcot.segmentation import (compress_segments, get_key_frames,
                                         segment_gripper, segment_nstep,
                                         soft_plus_gripper_segment,
                                         soft_segment)
from emmax_tpu.gcot.verbalize import describe_move


def _trajectory(rng, T=30):
    """Piecewise trajectory with 3 distinct phases."""
    state = np.zeros((T, 6))
    state[:10, 0] = np.linspace(0, 0.2, 10)          # move x
    state[10:20, 2] = np.linspace(0, 0.3, 10)        # then z
    state[10:, 0] = 0.2
    state[20:, 1] = np.linspace(0, 0.25, 10)         # then y
    state[20:, 2] = 0.3
    state += rng.normal(scale=1e-4, size=state.shape)
    return state


def test_segment_traj_finds_phases():
    rng = np.random.default_rng(0)
    segs = soft_segment(_trajectory(rng))
    assert len(segs) == 30
    assert len(set(segs.tolist())) >= 2  # finds multiple phases


def test_segment_gripper():
    g = [1, 1, 1, 0, 0, 1, 1]
    assert segment_gripper(g) == [0, 0, 0, 3, 3, 5, 5]


def test_soft_plus_gripper_and_keyframes():
    rng = np.random.default_rng(1)
    state = _trajectory(rng)
    gripper = np.array([1.0] * 15 + [0.0] * 15)
    overall = soft_plus_gripper_segment(state, gripper)
    frames = [f"img{i}" for i in range(30)]
    key_frames, count = get_key_frames(frames, overall)
    assert count >= 2
    assert key_frames[0] == "Segment 1:"
    assert key_frames[1] == "img0"


def test_compress_segments():
    assert compress_segments(np.array([5, 5, 9, 9, 9, 2])) == [1, 1, 2, 2, 2, 3]
    assert segment_nstep(7, 3) == [0, 0, 0, 1, 1, 1, 2]


def test_describe_move_solver_roundtrip():
    """describe_move output parses back through the Solver grammar (for the
    axes both sides agree on)."""
    from emmax_tpu.vla.action_tokenizer import ActionTokenizer
    from emmax_tpu.vla.solver import Solver
    from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

    move = np.array([0.003, -0.002, 0.001, 0.0, 0.0, 0.0, 1.0])
    text = "MOVEMENT:\n" + describe_move(move) + "\n"
    solver = Solver(ActionTokenizer(ByteLevelTokenizer()))
    require_unnorm, parsed = solver.extract_movement_plan(text)
    assert require_unnorm is False
    # xyz: mm steps -> solver re-scales by pi/180 per step
    deg = math.pi / 180
    np.testing.assert_allclose(parsed[:3], [-2 * deg, 3 * deg, 1 * deg])
    assert parsed[6] == 1.0


def test_validate_plan():
    assert validate_plan("{1: ['a', 'b'], 2: ['c', 'd']}", 2) is not None
    assert validate_plan("{1: ['a', 'b']}", 2) is None        # count mismatch
    assert validate_plan("{1: ['a']}", 1) is None              # not a 2-tuple
    assert validate_plan("no dict here", 1) is None


def test_generate_plans_with_heuristic():
    samples = [{"key": f"traj{i}", "instruction": f"do thing {i}",
                "key_frames": [], "segment_count": 3,
                "segments": [1, 1, 2, 2, 3, 3]} for i in range(3)]
    plans = generate_plans(samples, HeuristicAnnotator())
    assert len(plans) == 3
    for key, (instr, segs, text) in plans.items():
        assert validate_plan(text, 3) is not None


def _raw_sample(rng, T=12):
    return RawSample(
        sample_dir="bridge/train/traj0",
        instruction="put the cup on the plate",
        highlevel_plan="{1: ['reach', 'need to reach'], "
                       "2: ['grasp', 'need to grasp'], "
                       "3: ['place', 'need to place']}",
        segments=[1] * 4 + [2] * 4 + [3] * 4,
        gripper_2d=[[i, i + 1] for i in range(T)],
        full_state=rng.normal(size=(T, 7)),
        action_policy=rng.uniform(-1, 1, size=(T, 7)),
    )


def test_assemble_single_policy():
    rng = np.random.default_rng(2)
    samples, stats, report = assemble_dataset([_raw_sample(rng)],
                                              mode="single_policy")
    assert report == {"valid": 1}
    assert len(samples) == 11                     # T-1 frames
    s = samples[0]
    assert s["current_image_path"] == "bridge/train/traj0/im_0.jpg"
    assert "INSTRUCTION: \nput the cup on the plate" in s["user"]
    assert s["assistant_reason_level"].startswith("REASONING: need to reach")
    assert "NEXT GRIPPER: [1, 2]" in s["assistant_position_level"]
    assert len(s["assistant_action_policy"]) == 1  # single next-frame policy
    assert len(s["delta_full_state_norm"]) == 7
    assert "Q1" in stats and "Q99" in stats


def test_assemble_multiple_policy():
    rng = np.random.default_rng(3)
    samples, _, report = assemble_dataset([_raw_sample(rng)],
                                          mode="multiple_policy")
    assert len(samples) == 3                      # one per segment
    # whole-segment policy chunk
    assert len(samples[0]["assistant_action_policy"]) == 4


def test_assemble_aug_multiple_policy():
    rng = np.random.default_rng(4)
    samples, _, _ = assemble_dataset([_raw_sample(rng)],
                                     mode="aug_multiple_policy")
    assert len(samples) >= 8
    # first frame's policies run to its segment end
    assert len(samples[0]["assistant_action_policy"]) == 4


def test_assemble_invalid_plans_reported():
    rng = np.random.default_rng(5)
    bad = _raw_sample(rng)
    bad.highlevel_plan = "NA"
    bad2 = _raw_sample(rng)
    bad2.highlevel_plan = "{1: ['a', 'b']}"  # wrong segment count
    samples, _, report = assemble_dataset([bad, bad2], mode="single_policy")
    assert samples == []
    assert report.get("no response") == 1
    assert report.get("wrong segment number") == 1


def test_gcot_json_feeds_training_dataset():
    """Assembled samples flow straight into GCOTDataset."""
    from emmax_tpu.data.gcot import GCOTDataset, SyntheticFrameSource
    from emmax_tpu.vla.action_tokenizer import ActionTokenizer
    from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

    rng = np.random.default_rng(6)
    samples, _, _ = assemble_dataset([_raw_sample(rng)], mode="single_policy")
    tok = ByteLevelTokenizer()
    ds = GCOTDataset(samples, ActionTokenizer(tok), tok,
                     SyntheticFrameSource(32), data_mix="movement_policy",
                     mask_inst=True)
    item = ds[0]
    assert len(item["input_ids"]) > 10
    assert item["image"].shape == (32, 32, 3)
