"""GCOT plan generation CLI.

Counterpart of ``/root/reference/GCOT/generate_plans.py:19-191``: stream
bridge trajectories, segment them (soft / soft+gripper / gripper / nstep),
send segmented key-frames to the plan annotator, and write
``plans/plans_{split}.json``. The annotator defaults to the hermetic
``HeuristicAnnotator``; pass ``--annotator gemini`` for the reference's
Gemini path (requires network).

Usage:
  python scripts/gcot_generate_plans.py --data_dir data/bridge_rlds \
      --split train --segmentation soft --out_dir plans
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from emmax_tpu.conf import parse_config
from emmax_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch("gcot-plans")


@dataclass
class PlansConfig:
    data_dir: Path = Path("data/bridge_rlds")
    split: str = "train"
    out_dir: Path = Path("plans")
    segmentation: str = "soft"          # soft | soft_gripper | gripper | nstep
    annotator: str = "heuristic"        # heuristic | gemini
    nstep: int = 5
    limit: int = 0                      # 0 = all
    checkpoint_every: int = 1000


def main(cfg: PlansConfig) -> None:
    import numpy as np

    from emmax_tpu.data.rlds import load_bridgev2_dataset
    from emmax_tpu.gcot.plans import (GeminiAnnotator, HeuristicAnnotator,
                                      generate_plans)
    from emmax_tpu.gcot.segmentation import (compress_segments,
                                             get_key_frames, segment_gripper,
                                             segment_nstep,
                                             soft_plus_gripper_segment,
                                             soft_segment)

    ds, _ = load_bridgev2_dataset(cfg.data_dir, cfg.split)
    annotator = (HeuristicAnnotator() if cfg.annotator == "heuristic"
                 else GeminiAnnotator())

    samples = []
    for i, traj in enumerate(ds.as_numpy_iterator()):
        if cfg.limit and i >= cfg.limit:
            break
        key = (traj["file_path"][0].decode() + "|"
               + str(int(traj["episode_id"][0])))
        instruction = traj["task"]["language_instruction"].decode() \
            if hasattr(traj["task"]["language_instruction"], "decode") \
            else str(traj["task"]["language_instruction"])
        proprio = traj["observation"]["proprio"][:, :6]
        if cfg.segmentation == "soft":
            overall = soft_segment(proprio)
        elif cfg.segmentation == "soft_gripper":
            overall = soft_plus_gripper_segment(proprio,
                                                traj["action"][:, -1])
        elif cfg.segmentation == "gripper":
            overall = np.asarray(segment_gripper(traj["action"][:, -1]))
        else:
            overall = np.asarray(segment_nstep(len(proprio), cfg.nstep))
        segments = compress_segments(overall)
        images = traj["observation"]["image_primary"]
        key_frames, count = get_key_frames(list(images), overall)
        samples.append({"key": key, "instruction": instruction,
                        "key_frames": key_frames, "segment_count": count,
                        "segments": segments})

    out = Path(cfg.out_dir) / f"plans_{cfg.split}.json"
    generate_plans(samples, annotator, out_path=out,
                   checkpoint_every=cfg.checkpoint_every)
    overwatch.info(f"wrote {out}")


if __name__ == "__main__":
    main(parse_config(PlansConfig, sys.argv[1:]))
