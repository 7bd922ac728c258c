import math

import numpy as np
import pytest

from emmax_tpu.vla.action_tokenizer import ActionTokenizer
from emmax_tpu.vla.solver import Solver
from emmax_tpu.vla.tokenizer import ByteLevelTokenizer


@pytest.fixture(scope="module")
def solver():
    return Solver(ActionTokenizer(ByteLevelTokenizer()))


@pytest.fixture(scope="module")
def at():
    return ActionTokenizer(ByteLevelTokenizer())


def make_policy_text(at, actions):
    return ";".join(at(a) for a in actions)


def test_extract_coordinates(solver):
    text = "SUBTASK: lift\n\nNEXT GRIPPER: [105, 74]\n\nMOVEMENT:\nx"
    assert solver.extract_2d_coordinates(text) == [105, 74]
    assert solver.extract_2d_coordinates("garbage") == [0, 0]


def test_extract_action_policies_roundtrip(solver, at):
    rng = np.random.default_rng(0)
    actions = rng.uniform(-1, 1, size=(3, 7))
    text = "REASONING: foo\nPOLICIES:\n" + make_policy_text(at, actions) + "\n"
    policies, remain = solver.extract_action_policies(text)
    assert remain == "REASONING: foo\n"
    assert len(policies) == 3
    expected = at.decode_token_ids_to_actions(at.encode_to_ids(actions))
    np.testing.assert_allclose(np.array(policies), expected)


def test_policies_without_key(solver, at):
    actions = np.zeros((1, 7))
    text = make_policy_text(at, actions)
    policies, remain = solver.extract_action_policies(text)
    assert remain == ""
    assert len(policies) == 1 and len(policies[0]) == 7


def test_malformed_policy_becomes_zeros(solver):
    # a policy string with != 7 tokens after the word-boundary piece zeroes
    # out (solver.py:129-130)
    policies, _ = solver.extract_action_policies("POLICIES:\nhi\n")
    assert policies == [[0.0] * 7]


def test_movement_textual_grammar(solver):
    text = ("MOVEMENT:\nmove forward 3 steps; move left 2 steps; "
            "roll upward 5 steps; open gripper;\n")
    require_unnorm, vec = solver.extract_movement_plan(text)
    assert require_unnorm is False
    deg = math.pi / 180
    np.testing.assert_allclose(
        vec, [2 * deg, 3 * deg, 0.0, 5e-3, 0.0, 0.0, 1.0])


def test_movement_tokenized(solver, at):
    vals = np.linspace(-0.9, 0.9, 7)
    text = "MOVEMENT:\n" + at(vals) + "\nPOLICIES:..."
    require_unnorm, vec = solver.extract_movement_plan(text)
    assert require_unnorm is True
    expected = at.decode_token_ids_to_actions(at.encode_to_ids(vals))
    np.testing.assert_allclose(vec, expected)


def test_movement_parse_failure(solver):
    require_unnorm, vec = solver.extract_movement_plan("no movement here")
    assert require_unnorm is None
    np.testing.assert_array_equal(vec, [-100.0] * 7)


def test_evaluate_batch_identical_is_perfect(solver, at):
    rng = np.random.default_rng(1)
    actions = rng.uniform(-1, 1, size=(2, 7))
    text = ("REASONING: r\nSUBTASK: s\nNEXT GRIPPER: [10, 20]\n"
            "MOVEMENT:\n" + at(actions[0]) + "\nPOLICIES:\n"
            + make_policy_text(at, actions))
    state, acc, l1, rel, pred, gt = solver.evaluate_batch([text], [text])
    assert acc == [1.0]
    assert l1 == [0.0]


def test_close_gripper_grammar(solver):
    _, vec = solver.extract_movement_plan("MOVEMENT:\nclose gripper;\n")
    assert vec[6] == 0.0  # close => level 0 via round("open" in clause)
