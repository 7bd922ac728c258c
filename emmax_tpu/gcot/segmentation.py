"""Trajectory segmentation for GCOT generation.

Counterpart of ``/root/reference/GCOT/utils.py:18-200``: HDBSCAN
(min_cluster_size=3) over 6-DoF proprio + scaled time (``i/30``) with a
spatio-temporal metric, gripper change-point segmentation, and the composed
strategies (``soft``, ``soft_plus_gripper``, ``gripper``, ``nstep``) plus
key-frame selection. Uses sklearn's HDBSCAN (the reference used the
``hdbscan`` package; identical algorithm).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def _forward_fill_noise(segments: Sequence[int]) -> List[int]:
    """HDBSCAN labels noise as -1; carry the previous cluster forward
    (utils.py:20-28)."""
    out, previous = [], 0
    for seg in segments:
        if seg != -1:
            previous = seg
        out.append(previous)
    return out


def segment_traj(full_state: np.ndarray, distance: str = "euclidean",
                 time_weight: float = 1.0,
                 time_scale: float = 1.0 / 30.0) -> Tuple[List[int], np.ndarray]:
    """HDBSCAN over [state | i * time_scale] with combined spatial+temporal
    distance (utils.py:18-47). Returns (forward-filled labels, raw labels)."""
    from scipy.spatial.distance import euclidean
    from sklearn.cluster import HDBSCAN

    def spatio_temporal(p1, p2):
        if distance == "euclidean":
            spatial = euclidean(p1[:-1], p2[:-1])
        else:  # cosine
            from sklearn.metrics.pairwise import cosine_similarity

            spatial = float(cosine_similarity([p1[:-1]], [p2[:-1]]))
        return spatial + time_weight * abs(p1[-1] - p2[-1])

    x = np.stack([np.append(o, i * time_scale)
                  for i, o in enumerate(np.asarray(full_state, np.float64))])
    labels = HDBSCAN(min_cluster_size=3, metric=spatio_temporal).fit_predict(x)
    return _forward_fill_noise(labels), labels


def segment_gripper(gripper_state: Sequence[float]) -> List[int]:
    """Change-point segments over a (near-)binary gripper signal: each frame
    labeled with the index where its current open/close run began
    (utils.py:50-61)."""
    previous_index = 0
    out = []
    for i, state in enumerate(gripper_state):
        if round(float(state)) != round(float(gripper_state[previous_index])):
            previous_index = i
        out.append(previous_index)
    return out


def segment_nstep(n_frames: int, step: int = 5) -> List[int]:
    """Fixed n-step segmentation baseline (``get_nstep_segment``)."""
    return [i // step for i in range(n_frames)]


def soft_segment(proprio_6dof: np.ndarray) -> np.ndarray:
    """Default Emma-X strategy (``get_soft_segment``, generate_plans.py:15):
    HDBSCAN over the raw 6-DoF pose."""
    processed, _ = segment_traj(proprio_6dof, distance="euclidean")
    return np.asarray(processed)


def soft_plus_gripper_segment(proprio_6dof: np.ndarray,
                              gripper_action: Sequence[float]) -> np.ndarray:
    """``get_soft_plus_gripper_segment`` (utils.py:64-111): pose clusters
    scaled by 1e2 combined with gripper change-points."""
    processed, _ = segment_traj(proprio_6dof, distance="euclidean")
    pose_segment = np.asarray(processed)
    gripper_segment = np.asarray(segment_gripper(gripper_action))
    return pose_segment * 100 + gripper_segment


def compress_segments(overall_segment: np.ndarray) -> List[int]:
    """Relabel arbitrary segment ids to consecutive 1..K in order of first
    appearance (the ``RawSample.prepare_segments`` convention,
    create_dataset.py:59-76 — segments start at 1)."""
    out, seen, count = [], {}, 0
    for s in overall_segment:
        s = int(s)
        if s not in seen:
            count += 1
            seen[s] = count
        out.append(seen[s])
    return out


def get_key_frames(images: Sequence, overall_segment: np.ndarray
                   ) -> Tuple[List, int]:
    """Interleave "Segment k:" markers with the first frame of each segment
    (utils.py:190-200) — the multimodal prompt sent to the plan annotator."""
    segments = compress_segments(overall_segment)
    key_frames: List = []
    last = None
    for img, seg in zip(images, segments):
        if seg != last:
            key_frames.append(f"Segment {seg}:")
            key_frames.append(img)
            last = seg
    return key_frames, max(segments)
