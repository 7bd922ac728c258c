"""Trajectory-level relabeling: pad masks, goal relabeling, task augmentation.

Host-side tf.data transforms mirroring the reference's
``/root/reference/prismatic/vla/datasets/rlds/traj_transforms.py:84-104``
(``add_pad_mask_dict``),
``/root/reference/prismatic/vla/datasets/rlds/utils/goal_relabeling.py:15-32``
(``uniform``) and
``/root/reference/prismatic/vla/datasets/rlds/utils/task_augmentation.py:14-57``
(``delete_task_conditioning``). Each function takes an optional ``rand``
callable (shape → float32 tensor in [0, 1)) so parity tests can drive both
this implementation and the reference with identical random draws; the
default uses ``tf.random.uniform``.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

try:  # TF is host-only and optional (same gate as emmax_tpu.data.rlds)
    import tensorflow as tf

    HAVE_TF = True
except Exception:  # pragma: no cover
    tf = None
    HAVE_TF = False


def tree_merge(*trees: Dict) -> Dict:
    """Recursive dict merge, later trees win (ref data_utils.py:28-36)."""
    merged: Dict = {}
    for tree in trees:
        for k, v in tree.items():
            if isinstance(v, dict):
                merged[k] = tree_merge(merged.get(k, {}), v)
            else:
                merged[k] = v
    return merged


def to_padding(tensor):
    """Padding value for a tensor: zeros for numerics, "" for strings
    (ref data_utils.py:39-45)."""
    if tensor.dtype == tf.string:
        return tf.fill(tf.shape(tensor), "")
    return tf.zeros_like(tensor)


def add_pad_mask_dict(traj: Dict) -> Dict:
    """Mark which observation/task entries are padding (empty strings)
    (ref traj_transforms.py:84-104)."""
    traj_len = tf.shape(traj["action"])[0]
    for key in ("observation", "task"):
        pad_mask_dict = {}
        for subkey in traj[key]:
            if traj[key][subkey].dtype == tf.string:
                pad_mask_dict[subkey] = tf.strings.length(traj[key][subkey]) != 0
            else:
                pad_mask_dict[subkey] = tf.ones([traj_len], dtype=tf.bool)
        traj[key]["pad_mask_dict"] = pad_mask_dict
    return traj


def uniform_goal_relabel(traj: Dict,
                         rand: Optional[Callable] = None) -> Dict:
    """Relabel each transition's goal with a uniformly random *future* state
    (ref goal_relabeling.py:15-32): goal index for step i drawn from
    [i + 1, traj_len), clamped to traj_len - 1; the sampled observation is
    merged into ``traj["task"]`` mirroring observation keys."""
    if rand is None:
        rand = lambda shape: tf.random.uniform(shape)  # noqa: E731
    traj_len = tf.shape(tf.nest.flatten(traj["observation"])[0])[0]

    u = rand([traj_len])
    low = tf.cast(tf.range(traj_len) + 1, tf.float32)
    high = tf.cast(traj_len, tf.float32)
    goal_idxs = tf.cast(u * (high - low) + low, tf.int32)
    goal_idxs = tf.minimum(goal_idxs, traj_len - 1)

    goal = tf.nest.map_structure(lambda x: tf.gather(x, goal_idxs),
                                 traj["observation"])
    traj["task"] = tree_merge(traj.get("task", {}), goal)
    return traj


GOAL_RELABELING_STRATEGIES = {"uniform": uniform_goal_relabel}


def delete_task_conditioning(traj: Dict, keep_image_prob: float,
                             rand: Optional[Callable] = None) -> Dict:
    """Per-transition, randomly keep EITHER the goal images OR the language
    instruction (ref task_augmentation.py:14-57). No-op unless both are
    present. Transitions whose language is already padding always keep the
    images; dropped keys are replaced by padding and their pad-mask zeroed;
    when images are dropped the goal timestep snaps to the final step."""
    if "language_instruction" not in traj["task"]:
        return traj
    image_keys = {k for k in traj["task"]
                  if k.startswith("image_") or k.startswith("depth_")}
    if not image_keys:
        return traj
    if rand is None:
        rand = lambda shape: tf.random.uniform(shape)  # noqa: E731

    traj_len = tf.shape(traj["action"])[0]
    should_keep_images = rand([traj_len]) < keep_image_prob
    should_keep_images |= ~traj["task"]["pad_mask_dict"]["language_instruction"]

    for key in image_keys | {"language_instruction"}:
        should_keep = (should_keep_images if key in image_keys
                       else ~should_keep_images)
        traj["task"][key] = tf.where(
            should_keep, traj["task"][key], to_padding(traj["task"][key]))
        traj["task"]["pad_mask_dict"][key] = tf.where(
            should_keep,
            traj["task"]["pad_mask_dict"][key],
            tf.zeros_like(traj["task"]["pad_mask_dict"][key]))

    if "timestep" in traj["task"]:
        traj["task"]["timestep"] = tf.where(
            should_keep_images, traj["task"]["timestep"], traj_len - 1)
    return traj


TASK_AUGMENT_STRATEGIES = {"delete_task_conditioning": delete_task_conditioning}
