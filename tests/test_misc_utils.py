"""Coverage for the smaller utility subsystems."""

import json

import numpy as np
import pytest

from emmax_tpu.data.collators import collate_lm
from emmax_tpu.data.download import mix_instruct_datasets
from emmax_tpu.training.metrics import (JSONLinesTracker, VLAMetrics,
                                        build_trackers)
from emmax_tpu.util.batching import split_modality_batches
from emmax_tpu.util.profiling import SectionTimer
from emmax_tpu.util.seeding import make_worker_rng, set_global_seed
from emmax_tpu.vla.tokenizer import ByteLevelTokenizer


def test_split_modality_batches_grouping():
    lengths = [10, 20, 5, 7, 30, 12, 9, 40]
    is_mm = [True, True, False, False, True, True, False, False]
    batches = split_modality_batches(lengths, is_mm, batch_size=2, seed=1)
    for b in batches:
        mods = {is_mm[i] for i in b}
        assert len(mods) == 1          # never mixes modalities in a batch
        ls = [lengths[i] for i in b]
        assert ls == sorted(ls, reverse=True)   # in-bucket length sort


def test_split_modality_sharding():
    lengths = list(range(16))
    is_mm = [True] * 16
    b0 = split_modality_batches(lengths, is_mm, 2, num_shards=2, shard_index=0)
    b1 = split_modality_batches(lengths, is_mm, 2, num_shards=2, shard_index=1)
    assert len(b0) + len(b1) == 8
    flat = sorted(i for b in b0 + b1 for i in b)
    assert flat == list(range(16))


def test_collate_lm_multimodal_indices():
    tok = ByteLevelTokenizer()
    samples = [
        {"image": np.zeros((32, 32, 3), np.uint8), "input_ids": [1, 5, 6],
         "labels": [1, 5, 6]},
        {"image": None, "input_ids": [1, 7], "labels": [1, 7]},
    ]
    batch = collate_lm(samples, tok.pad_id, default_image_shape=(32, 32, 3))
    np.testing.assert_array_equal(batch["multimodal_indices"], [0])
    assert batch["images"].shape == (2, 32, 32, 3)


def test_mix_instruct_datasets(tmp_path):
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text(json.dumps([{"conversations": [i]} for i in range(5)]))
    b.write_text(json.dumps([{"conversations": [i + 100]} for i in range(3)]))
    out = tmp_path / "mix.json"
    n = mix_instruct_datasets(a, [b], out)
    assert n == 8
    assert len(json.loads(out.read_text())) == 8


def test_vla_metrics_per_dataset(tmp_path):
    m = VLAMetrics(build_trackers(["jsonl"], "run", tmp_path))
    m.commit_for_dataset("bridge_orig", loss=1.0)
    m.commit(loss=2.0)
    pushed = m.push(lr=1e-4)
    assert pushed["bridge_orig/loss"] == 1.0
    assert pushed["loss"] == 2.0
    assert (tmp_path / "run.jsonl").exists()


def test_section_timer():
    t = SectionTimer()
    with t("x"):
        pass
    with t("x"):
        pass
    s = t.summary()
    assert s["x"]["count"] == 2


def test_seeding_determinism():
    set_global_seed(42)
    r1 = make_worker_rng(42, worker_id=3, epoch=1).integers(0, 100, 5)
    r2 = make_worker_rng(42, worker_id=3, epoch=1).integers(0, 100, 5)
    r3 = make_worker_rng(42, worker_id=4, epoch=1).integers(0, 100, 5)
    np.testing.assert_array_equal(r1, r2)
    assert not np.array_equal(r1, r3)


def test_monitor_folder_sweep(tmp_path):
    import sys
    sys.path.insert(0, "scripts")
    from monitor_folder import sweep

    for i in range(3):
        d = tmp_path / f"step-{i:06d}-epoch-00-loss=1.0000"
        d.mkdir()
        (d / "data.bin").write_bytes(b"x" * 1000)
    removed = sweep(tmp_path, limit_bytes=1500)
    assert removed == 2
    remaining = list(tmp_path.iterdir())
    assert len(remaining) == 1


def test_convert_to_jpg(tmp_path):
    from PIL import Image

    from emmax_tpu.data.download import convert_to_jpg

    d = tmp_path / "images"
    d.mkdir()
    Image.new("RGB", (4, 4), (255, 0, 0)).save(d / "a.png")
    Image.new("P", (4, 4)).save(d / "b.gif")
    Image.new("RGB", (4, 4), (0, 255, 0)).save(d / "c.jpg")
    convert_to_jpg(d)
    assert (d / "a.jpg").exists() and (d / "b.jpg").exists()
    assert Image.open(d / "a.jpg").size == (4, 4)
    # idempotent
    convert_to_jpg(d)
    # unexpected formats raise (reference behavior)
    (d / "x.bmp").write_bytes(b"")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="Unexpected image format"):
        convert_to_jpg(d)


def test_split_modality_batches_cover_every_example():
    """Trailing partial buckets are padded by stealing from the front
    (reference batching_utils.py:100-106) — no example is dropped."""
    from emmax_tpu.util.batching import split_modality_batches

    lengths = list(range(11))
    is_mm = [i % 2 == 0 for i in range(11)]   # 6 mm, 5 text
    batches = split_modality_batches(lengths, is_mm, batch_size=4)
    covered = {i for b in batches for i in b}
    assert covered == set(range(11))
    assert all(len(b) == 4 for b in batches)
    assert len(batches) == 4  # ceil(6/4) + ceil(5/4)
