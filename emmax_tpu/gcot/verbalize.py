"""Movement verbalization (7-DoF delta → textual movement string).

Counterpart of ``/root/reference/GCOT/utils.py:363-393`` (``describe_move``):
xyz scaled by 1000, orientation by 180/π, gripper thresholded at 0.5.
This is the (approximate) inverse of the Solver movement grammar
(``prismatic/vla/solver.py:59-101``). NOTE: faithfully reproduced quirk —
the yaw axis verbalizes as "yaw clockwise/counterclockwise" while the Solver
grammar only parses "yaw downward/upward" and "rotate_*"; the reference
shares this asymmetry.
"""

from __future__ import annotations

import math
from typing import Sequence

_NAMES = [
    {False: "move backward", True: "move forward"},
    {False: "move right", True: "move left"},
    {False: "move downward", True: "move upward"},
    {False: "roll downward", True: "roll upward"},
    {False: "pitch downward", True: "pitch upward"},
    {False: "yaw clockwise", True: "yaw counterclockwise"},
    {False: "close gripper", True: "open gripper"},
]


def describe_move(move_vec: Sequence[float]) -> str:
    assert len(move_vec) == 7
    parts = []
    for i, mv in enumerate(move_vec):
        mv = float(mv)
        if i < 3:  # xyz in meters → millimeter "steps"
            parts.append(_NAMES[i][mv > 0] + f" {abs(round(mv * 1000))} steps; ")
        elif i < 6:  # orientation in radians → degree "steps"
            parts.append(_NAMES[i][mv > 0]
                         + f" {abs(round(mv * 180 / math.pi))} steps; ")
        else:  # gripper
            parts.append(_NAMES[i][mv > 0.5] + ";")
    return "".join(parts)
