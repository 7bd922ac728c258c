"""RLDS-style trajectory pipeline (tf.data, TF-gated).

TPU-host counterpart of the reference RLDS stack
(``/root/reference/prismatic/vla/datasets/rlds/dataset.py:39-916`` + the OXE
config/transform registries). The reference depends on ``tensorflow_datasets``
+ ``dlimp``; neither is in this image, so episodes are read from a simple
self-describing TFRecord layout ("emmaX-rlds": one ``tf.train.Example`` per
episode — see ``write_episodes``/``EPISODE_SPEC``) that
``scripts/convert_rlds.py`` produces from any RLDS/TFDS source (run it once
wherever TFDS is installed, e.g. for the 124 GB ``bridge_orig``). All
pipeline *semantics* mirror the reference:

- ``standardize`` per-dataset transforms (``oxe/transforms.py`` — bridge_orig
  implemented: drop all-zero first step, binarize gripper, relabel actions,
  EEF/gripper state split),
- statistics + BOUNDS_Q99 normalization (``utils/data_utils.py:61-271``) via
  ``emmax_tpu.data.normalization``,
- trajectory transforms: unlabeled filter + window/future-window chunking
  (``utils/traj_transforms.py:14-71``),
- frame transforms: JPEG decode + resize,
- weighted interleave + shuffle (``dataset.py:678-809``),
- the *trajectory-level* ``load_bridgev2_dataset`` variant keeping
  ``file_path``/``episode_id`` join keys for GCOT (``dataset.py:812-916``).

Everything here is host-side input plumbing; nothing imports JAX.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from emmax_tpu.data.normalization import (NormalizationType,
                                          cached_statistics,
                                          compute_statistics)

try:  # TF is host-only and optional
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    HAVE_TF = True
except Exception:  # pragma: no cover
    tf = None
    HAVE_TF = False


def _require_tf():
    if not HAVE_TF:
        raise ImportError("tensorflow is required for the RLDS pipeline")


# === storage format ==========================================================
# one Example per episode; images stored as encoded JPEG/PNG bytes per step.
EPISODE_KEYS = ("steps/image_primary", "steps/proprio", "steps/action",
                "language_instruction", "file_path", "episode_id")


def write_episodes(path, episodes: Sequence[Dict]) -> None:
    """episodes: dicts with image_bytes (list[bytes]), proprio [T, Dp],
    action [T, Da], language (str), file_path (str), episode_id (int)."""
    _require_tf()
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with tf.io.TFRecordWriter(str(path)) as w:
        for ep in episodes:
            T = len(ep["image_bytes"])
            feat = {
                "steps/image_primary": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=list(ep["image_bytes"]))),
                "steps/proprio": tf.train.Feature(float_list=tf.train.FloatList(
                    value=np.asarray(ep["proprio"], np.float32).reshape(-1))),
                "steps/action": tf.train.Feature(float_list=tf.train.FloatList(
                    value=np.asarray(ep["action"], np.float32).reshape(-1))),
                "language_instruction": tf.train.Feature(
                    bytes_list=tf.train.BytesList(
                        value=[ep["language"].encode()])),
                "file_path": tf.train.Feature(bytes_list=tf.train.BytesList(
                    value=[str(ep["file_path"]).encode()])),
                "episode_id": tf.train.Feature(int64_list=tf.train.Int64List(
                    value=[int(ep["episode_id"])])),
                "num_steps": tf.train.Feature(int64_list=tf.train.Int64List(
                    value=[T])),
                "proprio_dim": tf.train.Feature(int64_list=tf.train.Int64List(
                    value=[int(np.asarray(ep["proprio"]).shape[-1])])),
                "action_dim": tf.train.Feature(int64_list=tf.train.Int64List(
                    value=[int(np.asarray(ep["action"]).shape[-1])])),
            }
            w.write(tf.train.Example(
                features=tf.train.Features(feature=feat)).SerializeToString())


def _parse_episode(serialized):
    spec = {
        "steps/image_primary": tf.io.VarLenFeature(tf.string),
        "steps/proprio": tf.io.VarLenFeature(tf.float32),
        "steps/action": tf.io.VarLenFeature(tf.float32),
        "language_instruction": tf.io.FixedLenFeature([], tf.string),
        "file_path": tf.io.FixedLenFeature([], tf.string),
        "episode_id": tf.io.FixedLenFeature([], tf.int64),
        "num_steps": tf.io.FixedLenFeature([], tf.int64),
        "proprio_dim": tf.io.FixedLenFeature([], tf.int64),
        "action_dim": tf.io.FixedLenFeature([], tf.int64),
    }
    ex = tf.io.parse_single_example(serialized, spec)
    T = ex["num_steps"]
    traj = {
        "observation": {
            "image_primary": tf.sparse.to_dense(ex["steps/image_primary"]),
            "proprio": tf.reshape(tf.sparse.to_dense(ex["steps/proprio"]),
                                  (T, ex["proprio_dim"])),
        },
        "action": tf.reshape(tf.sparse.to_dense(ex["steps/action"]),
                             (T, ex["action_dim"])),
        "task": {"language_instruction": ex["language_instruction"]},
        "file_path": tf.fill((T,), ex["file_path"]),
        "episode_id": tf.fill((T,), tf.cast(ex["episode_id"], tf.int32)),
    }
    return traj


# === per-dataset standardization (oxe/transforms.py) =========================

def _tf_binarize_gripper(actions):
    """TF mirror of normalization.binarize_gripper_actions (reverse scan,
    reference data_utils.py:107-142)."""
    def scan_fn(carry, a):
        return tf.cond(a > 0.95, lambda: 1.0,
                       lambda: tf.cond(a < 0.05, lambda: 0.0, lambda: carry))

    rev = tf.reverse(actions, axis=[0])
    out = tf.scan(scan_fn, rev, initializer=rev[0])
    return tf.reverse(out, axis=[0])


def bridge_orig_standardize(traj: Dict) -> Dict:
    """``bridge_orig_dataset_transform`` (oxe/transforms.py:61-86): drop the
    all-zero first step, binarize gripper dim, RELABEL movement actions to
    reached-state deltas dropping the final (action-less) step
    (``relabel_bridge_actions``, data_utils.py:166-172), split EEF/gripper
    state."""
    traj = {k: (tf.nest.map_structure(lambda x: x[1:], v)
                if k in ("observation",) else
                (v[1:] if k not in ("task",) else v))
            for k, v in traj.items()}
    traj["action"] = tf.concat(
        [traj["action"][:, :6],
         _tf_binarize_gripper(traj["action"][:, -1])[:, None]], axis=1)
    # reached-state relabel: xyz+rpy become proprio deltas
    move = (traj["observation"]["proprio"][1:, :6]
            - traj["observation"]["proprio"][:-1, :6])
    grip = traj["action"][:-1, -1:]
    task = traj.pop("task")
    traj = tf.nest.map_structure(lambda x: x[:-1], traj)
    traj["task"] = task
    traj["action"] = tf.concat([move, grip], axis=1)
    traj["observation"]["EEF_state"] = traj["observation"]["proprio"][:, :6]
    traj["observation"]["gripper_state"] = traj["observation"]["proprio"][:, -1:]
    return traj


STANDARDIZE_FNS: Dict[str, Callable] = {
    "bridge_orig": bridge_orig_standardize,
    "bridge": bridge_orig_standardize,
}

# normalization mask: xyz+rpy normalized, gripper passthrough
# (oxe/materialize.py:37-42 ABSOLUTE_ACTION_MASK for EEF_POS)
ACTION_PROPRIO_NORMALIZATION_MASK = [True] * 6 + [False]

# named mixtures (oxe/mixtures.py:11-196 — bridge subset; OXE mixes need
# their datasets converted first)
NAMED_MIXTURES: Dict[str, List[Tuple[str, float]]] = {
    "bridge": [("bridge_orig", 1.0)],
    "bridge_orig": [("bridge_orig", 1.0)],
}


# === dataset construction ====================================================

def make_dataset_from_rlds(
    data_dir,
    name: str = "bridge_orig",
    split: str = "train",
    *,
    standardize_fn: Optional[Callable] = None,
    normalization_type: NormalizationType = NormalizationType.BOUNDS_Q99,
    norm_mask: Optional[Sequence[bool]] = ACTION_PROPRIO_NORMALIZATION_MASK,
    cache_dir: Optional[str] = None,
    dataset_statistics: Optional[Dict] = None,
    keep_metadata: bool = True,
):
    """Trajectory-level tf.data.Dataset + statistics dict.

    Mirrors ``_make_dataset_from_rlds`` (dataset.py:39-251,397-408): parse →
    standardize → compute/cache statistics → normalize. Returns
    (dataset, statistics).
    """
    _require_tf()
    files = sorted(Path(data_dir).glob(f"{name}-{split}*.tfrecord*"))
    if not files:
        raise FileNotFoundError(f"no {name}-{split} tfrecords in {data_dir}")
    ds = tf.data.TFRecordDataset([str(f) for f in files])
    ds = ds.map(_parse_episode, num_parallel_calls=tf.data.AUTOTUNE)
    if standardize_fn is None:
        standardize_fn = STANDARDIZE_FNS.get(name)
    if standardize_fn is None:
        # fall back to the full OXE registry (emmax_tpu.data.oxe)
        from emmax_tpu.data.oxe import OXE_STANDARDIZATION_TRANSFORMS

        standardize_fn = OXE_STANDARDIZATION_TRANSFORMS.get(name)
    if standardize_fn is not None:
        ds = ds.map(standardize_fn, num_parallel_calls=tf.data.AUTOTUNE)

    def _post(traj):
        # reference `restructure` order: timestep AFTER standardization
        # (dataset.py:350-408) — adding it at parse time made it 1-based on
        # datasets that drop their first step (goal clamp off by one) —
        # plus per-frame dataset provenance for interleaved mixtures
        T = tf.shape(traj["action"])[0]
        traj["observation"]["timestep"] = tf.range(T, dtype=tf.int32)
        traj["dataset_name"] = tf.fill((T,), name)
        return traj

    ds = ds.map(_post, num_parallel_calls=tf.data.AUTOTUNE)

    if dataset_statistics is None:
        def compute():
            # statistics over ALL splits (reference uses split="all",
            # dataset.py:210-213) so train and val normalize identically
            all_files = sorted(Path(data_dir).glob(f"{name}-*.tfrecord*"))
            sds = tf.data.TFRecordDataset([str(f) for f in all_files])
            sds = sds.map(_parse_episode,
                          num_parallel_calls=tf.data.AUTOTUNE)
            if standardize_fn is not None:
                sds = sds.map(standardize_fn,
                              num_parallel_calls=tf.data.AUTOTUNE)
            actions, proprios = [], []
            for traj in sds.as_numpy_iterator():
                actions.append(traj["action"])
                proprios.append(traj["observation"]["proprio"])
            stats = {"action": compute_statistics(actions),
                     "proprio": compute_statistics(proprios),
                     "num_trajectories": len(actions)}
            if norm_mask is not None:
                stats["action"]["mask"] = list(norm_mask)
            return stats

        if cache_dir is not None:
            dataset_statistics = cached_statistics(
                cache_dir, [str(data_dir), name, "all"], compute)
        else:
            dataset_statistics = compute()

    a_stats = dataset_statistics["action"]
    p_stats = dataset_statistics["proprio"]

    def normalize(traj):
        def norm(x, st):
            mask = tf.constant(np.asarray(
                st.get("mask", [True] * len(st["min"])), bool))
            low = tf.constant(np.asarray(
                st["q01" if normalization_type == NormalizationType.BOUNDS_Q99
                   else "min"], np.float32))
            high = tf.constant(np.asarray(
                st["q99" if normalization_type == NormalizationType.BOUNDS_Q99
                   else "max"], np.float32))
            out = tf.where(mask, tf.clip_by_value(
                2.0 * (x - low) / (high - low + 1e-8) - 1.0, -1.0, 1.0), x)
            zeros = tf.constant(np.asarray(st["min"]) == np.asarray(st["max"]))
            return tf.where(zeros, tf.zeros_like(out), out)

        traj["action"] = norm(traj["action"], a_stats)
        traj["observation"]["proprio"] = norm(
            traj["observation"]["proprio"], p_stats)
        return traj

    if normalization_type is not None:
        ds = ds.map(normalize, num_parallel_calls=tf.data.AUTOTUNE)
    if not keep_metadata:
        def drop_meta(traj):
            traj = dict(traj)
            traj.pop("file_path", None)
            traj.pop("episode_id", None)
            return traj
        ds = ds.map(drop_meta, num_parallel_calls=tf.data.AUTOTUNE)
    return ds, dataset_statistics


def apply_trajectory_transforms(ds, *, train: bool = True,
                                window_size: int = 1,
                                future_action_window_size: int = 0,
                                skip_unlabeled: bool = False,
                                max_action: Optional[float] = None,
                                max_proprio: Optional[float] = None,
                                goal_relabeling_strategy: Optional[str] = None,
                                goal_relabeling_kwargs: Optional[Dict] = None,
                                task_augment_strategy: Optional[str] = None,
                                task_augment_kwargs: Optional[Dict] = None,
                                subsample_length: Optional[int] = None):
    """Trajectory-level transform stack mirroring the reference order
    (dataset.py:475-572): unlabeled/outlier filters → pad-mask dict → goal
    relabeling → task augmentation (train only) → window/future-window
    chunking with goal-timestep clamping (traj_transforms.py:14-71) →
    random subsampling (train only, traj_transforms.py:76-82)."""
    _require_tf()
    from emmax_tpu.data.relabeling import (GOAL_RELABELING_STRATEGIES,
                                           TASK_AUGMENT_STRATEGIES,
                                           add_pad_mask_dict)

    if skip_unlabeled:
        ds = ds.filter(
            lambda t: tf.strings.length(t["task"]["language_instruction"]) > 0)
    if max_action is not None:
        ds = ds.filter(lambda t: tf.reduce_all(
            tf.abs(t["action"]) <= max_action))
    if max_proprio is not None:
        ds = ds.filter(lambda t: tf.reduce_all(
            tf.abs(t["observation"]["proprio"]) <= max_proprio))

    ds = ds.map(add_pad_mask_dict, num_parallel_calls=tf.data.AUTOTUNE)

    if goal_relabeling_strategy is not None:
        fn = GOAL_RELABELING_STRATEGIES[goal_relabeling_strategy]
        kw = goal_relabeling_kwargs or {}
        ds = ds.map(lambda t: fn(t, **kw),
                    num_parallel_calls=tf.data.AUTOTUNE)

    if train and task_augment_strategy is not None:
        fn = TASK_AUGMENT_STRATEGIES[task_augment_strategy]
        kw = task_augment_kwargs or {}
        ds = ds.map(lambda t: fn(t, **kw),
                    num_parallel_calls=tf.data.AUTOTUNE)

    def chunk(traj):
        T = tf.shape(traj["action"])[0]
        w, f = window_size, future_action_window_size
        # history indices [T, w]; clamped at 0
        hist = tf.range(T)[:, None] + tf.range(-w + 1, 1)[None, :]
        hist = tf.maximum(hist, 0)
        # action chunk indices [T, w+f]; clamped at [0, goal timestep]
        # (traj_transforms.py:41-46: goal relabeling sets task/timestep)
        act = tf.range(T)[:, None] + tf.range(-w + 1, f + 1)[None, :]
        if "timestep" in traj.get("task", {}):
            goal_ts = traj["task"]["timestep"]
        else:
            goal_ts = tf.fill((T,), T - 1)
        clamped = tf.minimum(tf.maximum(act, 0), goal_ts[:, None])
        out = dict(traj)
        out["observation"] = tf.nest.map_structure(
            lambda x: tf.gather(x, hist), traj["observation"])
        out["action"] = tf.gather(traj["action"], clamped)
        # whole-observation padding marker (pre-trajectory history slots,
        # traj_transforms.py:53)
        out["observation"]["pad_mask"] = (
            tf.range(T)[:, None] + tf.range(-w + 1, 1)[None, :]) >= 0
        # actions gathered past the goal become neutral (zeros for relative
        # dims — traj_transforms.py:56-71; EEF deltas here are relative)
        past_goal = act > goal_ts[:, None]
        out["action"] = tf.where(past_goal[:, :, None],
                                 tf.zeros_like(out["action"]), out["action"])
        return out

    ds = ds.map(chunk, num_parallel_calls=tf.data.AUTOTUNE)

    if train and subsample_length is not None:
        def subsample(traj):
            T = tf.shape(traj["action"])[0]
            def do():
                idx = tf.random.shuffle(tf.range(T))[:subsample_length]
                return tf.nest.map_structure(
                    lambda x: tf.gather(x, idx)
                    if x.shape.ndims and x.shape.ndims > 0 else x, traj)
            return tf.cond(T > subsample_length, do, lambda: traj)

        ds = ds.map(subsample, num_parallel_calls=tf.data.AUTOTUNE)
    return ds


def flatten_trajectories(ds):
    """Trajectory dataset → frame dataset (dataset.py unflatten step)."""
    _require_tf()

    def to_frames(traj):
        T = tf.shape(traj["action"])[0]
        traj = dict(traj)
        # broadcast per-episode scalars (task) to per-frame
        traj["task"] = tf.nest.map_structure(
            lambda x: tf.fill((T,), x) if x.shape.ndims == 0 else x,
            traj["task"])
        return tf.data.Dataset.from_tensor_slices(traj)

    return ds.flat_map(to_frames)


def apply_frame_transforms(ds, *, resize: Optional[Tuple[int, int]] = None,
                           train: bool = False,
                           image_augment_kwargs: Optional[Dict] = None,
                           num_parallel_calls: int = 16,
                           augment_seed: int = 0):
    """Decode + resize, then (train only) augment every ``image_*`` key with
    a per-frame random seed (dataset.py:590-645: decode/resize at :627-634,
    augmentation at :636-643 via obs_transforms.augment; parallelism default
    from datasets.py:115). ``image_augment_kwargs`` is either one dlimp-style
    kwargs dict (with ``augment_order``) applied to every image, or a
    ``{name: kwargs}`` mapping keyed like ``image_{name}``; padding images
    (empty byte strings / pad-mask False) are left untouched."""
    _require_tf()

    def decode(frame):
        img = frame["observation"]["image_primary"]
        # possibly [w] window of encoded strings; decode each
        def dec_one(b):
            return tf.io.decode_image(b, expand_animations=False,
                                      dtype=tf.uint8, channels=3)

        if img.shape.ndims == 1:
            imgs = tf.map_fn(dec_one, img, fn_output_signature=tf.uint8)
        else:
            imgs = dec_one(img)
        if resize is not None:
            # dlimp parity (obs_transforms.py:75): antialias on, round and
            # clip BEFORE the uint8 cast — lanczos3 overshoots near edges
            # and a raw cast wraps (black specks) and truncates (bias)
            imgs = tf.image.resize(imgs, resize, method="lanczos3",
                                   antialias=True)
            imgs = tf.cast(tf.clip_by_value(tf.round(imgs), 0.0, 255.0),
                           tf.uint8)
        frame["observation"]["image_primary"] = imgs
        return frame

    ds = ds.map(decode, num_parallel_calls=num_parallel_calls)

    if train and image_augment_kwargs:
        from emmax_tpu.data.augment import augment_image

        def augment_frame(idx, frame):
            # one seed per frame; all image keys/window steps share it so
            # multi-view geometry stays consistent, with the image-name
            # index folded in (obs_transforms.py:27-40). STATELESS: the
            # seed folds the frame's ENUMERATION index with augment_seed —
            # reruns and checkpoint-restored pipelines see identical
            # augmentations (the augment ops are pure functions of
            # (image, seed)), while repeated epochs keep counting up so
            # augmentation diversity matches the reference's stateful
            # tf.random.uniform (dataset.py:639) without its
            # irreproducibility under a parallel map
            seed = tf.stack([tf.cast(idx % (2 ** 31 - 1), tf.int32),
                             tf.constant(augment_seed, tf.int32)])
            obs = frame["observation"]
            names = sorted(k[6:] for k in obs if k.startswith("image_"))
            if "augment_order" in image_augment_kwargs:
                per_name = {n: image_augment_kwargs for n in names}
            else:
                per_name = image_augment_kwargs
            for i, name in enumerate(names):
                if name not in per_name:
                    continue
                kw = per_name[name]
                img = obs[f"image_{name}"]
                img_seed = seed + i

                def aug_one(x):
                    return augment_image(x, img_seed, **kw)

                mask = obs.get("pad_mask_dict", {}).get(f"image_{name}")
                if img.shape.ndims == 4:  # [window, H, W, 3]
                    auged = tf.map_fn(aug_one, img, fn_output_signature=img.dtype)
                else:
                    auged = aug_one(img)
                if mask is not None:
                    # skip padding images (obs_transforms.py:32-40)
                    keep = tf.reshape(
                        tf.reduce_all(mask),
                        [])
                    auged = tf.cond(keep, lambda: auged, lambda: img)
                obs[f"image_{name}"] = auged
            frame["observation"] = obs
            return frame

        ds = ds.enumerate().map(
            augment_frame, num_parallel_calls=num_parallel_calls)
    return ds


def make_interleaved_dataset(datasets: Sequence, weights: Sequence[float], *,
                             shuffle_buffer_size: int = 1000,
                             seed: int = 7):
    """Weighted sampling across datasets + shuffle (dataset.py:678-809)."""
    _require_tf()
    weights = np.asarray(weights, np.float64)
    weights = (weights / weights.sum()).tolist()
    ds = tf.data.Dataset.sample_from_datasets(
        [d.repeat() for d in datasets], weights, seed=seed)
    return ds.shuffle(shuffle_buffer_size, seed=seed)


def make_single_dataset(data_dir, name: str = "bridge_orig",
                        split: str = "train", *, window_size: int = 1,
                        future_action_window_size: int = 0,
                        resize: Optional[Tuple[int, int]] = None,
                        cache_dir=None):
    """Full single-dataset frame pipeline (dataset.py:648-674)."""
    ds, stats = make_dataset_from_rlds(data_dir, name, split,
                                       cache_dir=cache_dir)
    ds = apply_trajectory_transforms(
        ds, window_size=window_size,
        future_action_window_size=future_action_window_size)
    ds = flatten_trajectories(ds)
    ds = apply_frame_transforms(ds, resize=resize)
    return ds, stats


def load_bridgev2_dataset(data_dir, split: str = "train", *, cache_dir=None):
    """Trajectory-level (non-flattened) bridge data with file_path/episode_id
    join keys — the GCOT join source (dataset.py:812-916)."""
    return make_dataset_from_rlds(data_dir, "bridge_orig", split,
                                  cache_dir=cache_dir, keep_metadata=True)


class RLDSFrameSource:
    """FrameSource over the trajectory-level dataset: materializes the
    ``file_path|episode_id → encoded frames`` index once (the reference holds
    the whole RLDS in RAM, datasets.py:459-476; here only the encoded JPEG
    bytes are held, ~20x smaller than decoded frames)."""

    def __init__(self, data_dir, splits=("train", "val"), cache_dir=None):
        _require_tf()
        self.index: Dict[str, np.ndarray] = {}
        for split in splits:
            try:
                ds, _ = load_bridgev2_dataset(data_dir, split,
                                              cache_dir=cache_dir)
            except FileNotFoundError:
                continue
            for traj in ds.as_numpy_iterator():
                key = (traj["file_path"][0].decode("utf-8") + "|"
                       + str(int(traj["episode_id"][0])))
                self.index[key] = traj["observation"]["image_primary"]

    def get_frame(self, key: str, index: int) -> np.ndarray:
        blob = self.index[key][index]
        img = tf.io.decode_image(blob, expand_animations=False,
                                 dtype=tf.uint8, channels=3)
        return img.numpy()


def _tf_rel2abs_gripper(actions):
    """TF mirror of normalization.rel2abs_gripper_actions: relative open(-)
    /close(+) commands → absolute [0, 1] state (data_utils.py:145-182)."""
    opening = tf.cast(actions < -0.1, tf.float32)
    closing = tf.cast(actions > 0.1, tf.float32)
    # +1 where opening, -1 where closing, 0 at no-ops; carry last command
    delta = opening - closing

    def scan_fn(carry, d):
        return tf.cond(tf.equal(d, 0.0), lambda: carry, lambda: d)

    # back-fill leading no-ops with the INVERSE of the first command (a
    # close command implies the gripper was open before it — reference
    # data_utils.py:155-161 and the numpy mirror in normalization.py);
    # default open when the trajectory never commands the gripper
    first = tf.scan(scan_fn, tf.reverse(delta, [0]),
                    initializer=tf.constant(0.0))
    first_cmd = tf.reverse(first, [0])[0]
    init = tf.where(tf.equal(first_cmd, 0.0), 1.0, -first_cmd)
    carried = tf.scan(scan_fn, delta, initializer=init)
    return tf.where(carried > 0, tf.ones_like(carried),
                    tf.zeros_like(carried))


def rt1_style_standardize(traj: Dict) -> Dict:
    """``rt1_dataset_transform`` semantics (oxe/transforms.py:102-116) on the
    episode layout: xyz+rpy action dims pass through; the relative gripper
    command becomes an absolute open(1)/close(0) state."""
    grip = _tf_rel2abs_gripper(traj["action"][:, -1])
    traj["action"] = tf.concat([traj["action"][:, :6], grip[:, None]], axis=1)
    traj["observation"]["EEF_state"] = traj["observation"]["proprio"][:, :6]
    traj["observation"]["gripper_state"] = traj["observation"]["proprio"][:, -1:]
    return traj


def taco_play_style_standardize(traj: Dict) -> Dict:
    """``taco_play_dataset_transform`` semantics (oxe/transforms.py:149-164):
    gripper dim clipped to [0, 1]; EEF/gripper state split."""
    traj["action"] = tf.concat(
        [traj["action"][:, :6],
         tf.clip_by_value(traj["action"][:, -1:], 0.0, 1.0)], axis=1)
    traj["observation"]["EEF_state"] = traj["observation"]["proprio"][:, :6]
    traj["observation"]["gripper_state"] = traj["observation"]["proprio"][:, -1:]
    return traj


STANDARDIZE_FNS.update({
    "rt_1": rt1_style_standardize,
    "kuka": rt1_style_standardize,          # same gripper relabeling
    "taco_play": taco_play_style_standardize,
})
NAMED_MIXTURES["bridge_rt_1"] = [("bridge_orig", 1.0), ("rt_1", 1.0)]
