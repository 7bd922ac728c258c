"""Native (C++) frame store: build, write, mmap-read, parallel decode."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from emmax_tpu.data.framestore import (FrameStore, FrameStoreWriter,
                                       build_native)


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    build_native()
    root = tmp_path_factory.mktemp("efs")
    writer = FrameStoreWriter(root / "frames.efs")
    originals = {}
    yy, xx = np.mgrid[0:64, 0:64]
    for t in range(3):
        key = f"bridge/train/traj{t}|{t}"
        # smooth gradients compress well (JPEG fidelity is measurable)
        frames = [np.stack([(xx * 2 + f * 10) % 256, (yy * 3 + t * 20) % 256,
                            ((xx + yy) + f * 5) % 256], -1).astype(np.uint8)
                  for f in range(5)]
        originals[key] = frames
        writer.add_trajectory_arrays(key, frames, quality=98)
    path = writer.finalize()
    return FrameStore(path), originals


def test_open_and_index(store):
    fs, originals = store
    assert fs.num_trajectories == 3
    assert set(fs.keys()) == set(originals)
    n, w, h = fs.traj_info("bridge/train/traj1|1")
    assert (n, w, h) == (5, 64, 64)


def test_single_frame_decode_matches_cv2(store):
    fs, originals = store
    key = "bridge/train/traj0|0"
    img = fs.get_frame(key, 2)
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    # JPEG is lossy; at q=98 the roundtrip should be close
    diff = np.abs(img.astype(int) - originals[key][2].astype(int)).mean()
    assert diff < 20


def test_batch_decode_parallel(store):
    fs, originals = store
    keys = ["bridge/train/traj0|0", "bridge/train/traj1|1",
            "bridge/train/traj2|2", "bridge/train/traj0|0"]
    idxs = [0, 1, 2, 4]
    batch = fs.get_batch(keys, idxs)
    assert batch.shape == (4, 64, 64, 3)
    # each batch row equals the single-frame decode
    for i, (k, fi) in enumerate(zip(keys, idxs)):
        np.testing.assert_array_equal(batch[i], fs.get_frame(k, fi))


def test_missing_key_raises(store):
    fs, _ = store
    with pytest.raises(KeyError):
        fs.get_frame("nope", 0)


def test_framesource_protocol(store):
    """FrameStore satisfies the GCOTDataset FrameSource protocol."""
    fs, _ = store
    from emmax_tpu.data.gcot import GCOTDataset, make_dummy_gcot_items
    from emmax_tpu.vla.action_tokenizer import ActionTokenizer
    from emmax_tpu.vla.tokenizer import ByteLevelTokenizer

    items = make_dummy_gcot_items(2)
    # point items at store keys
    for i, item in enumerate(items):
        item["current_image_path"] = f"bridge/train/traj{i}|{i}/im_1.jpg"
    tok = ByteLevelTokenizer()
    ds = GCOTDataset(items, ActionTokenizer(tok), tok, fs,
                     data_mix="movement_policy")
    assert ds[0]["image"].shape == (64, 64, 3)
