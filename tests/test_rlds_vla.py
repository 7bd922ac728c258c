"""OpenVLA-style RLDS action-token training path."""

import numpy as np
import pytest

from emmax_tpu.data.rlds_vla import RLDSBatchTransform, StreamingBatcher
from emmax_tpu.models.llama import IGNORE_INDEX
from emmax_tpu.vla.action_tokenizer import ActionTokenizer
from emmax_tpu.vla.tokenizer import ByteLevelTokenizer


@pytest.fixture(scope="module")
def transform():
    tok = ByteLevelTokenizer()
    return RLDSBatchTransform(ActionTokenizer(tok), tok), tok


def _frame(rng, window=True):
    action = rng.uniform(-1, 1, size=(7,)).astype(np.float32)
    if window:
        action = action[None]
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    if window:
        img = img[None]
    return {"action": action,
            "observation": {"image_primary": img},
            "task": {"language_instruction": b"Pick Up The Fork"}}


def test_transform_supervises_action_tokens_only(transform):
    tf_, tok = transform
    rng = np.random.default_rng(0)
    out = tf_(_frame(rng))
    labels = np.asarray(out["labels"])
    ids = np.asarray(out["input_ids"])
    supervised = labels != IGNORE_INDEX
    # exactly 7 action tokens + 1 stop token supervised
    assert supervised.sum() == 8
    assert supervised[-8:].all() and not supervised[:-8].any()
    # supervised action ids live in the action-token region
    at_begin = tok.vocab_size - 257
    assert (ids[-8:-1] > at_begin).all()
    assert out["image"].shape == (32, 32, 3)
    # prompt contains the lowercased instruction
    text = tok.decode(list(ids))
    assert "pick up the fork" in text


def test_transform_no_stop_token(transform):
    _, tok = transform
    tf2 = RLDSBatchTransform(ActionTokenizer(tok), tok,
                             predict_stop_token=False)
    rng = np.random.default_rng(1)
    out = tf2(_frame(rng, window=False))
    labels = np.asarray(out["labels"])
    assert (labels != IGNORE_INDEX).sum() == 7


def test_streaming_batcher_sharding(transform):
    tf_, tok = transform
    rng = np.random.default_rng(2)
    samples = [tf_(_frame(rng)) for _ in range(12)]

    from emmax_tpu.data.collators import collate_train

    b0 = StreamingBatcher(samples, 2, lambda s: collate_train(s, tok.pad_id),
                          num_shards=2, shard_index=0)
    b1 = StreamingBatcher(samples, 2, lambda s: collate_train(s, tok.pad_id),
                          num_shards=2, shard_index=1)
    batches0, batches1 = list(b0), list(b1)
    assert len(batches0) == len(batches1) == 3
    assert batches0[0]["input_ids"].shape[0] == 2


@pytest.mark.skipif(
    pytest.importorskip("tensorflow") is None, reason="tf required")
def test_iterable_dataset_streams(tmp_path):
    import tensorflow as tf

    from emmax_tpu.data.rlds import write_episodes
    from emmax_tpu.data.rlds_vla import RLDSIterableDataset

    rng = np.random.default_rng(3)

    def jpeg():
        return tf.io.encode_jpeg(
            rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)).numpy()

    eps = [{"image_bytes": [jpeg() for _ in range(6)],
            "proprio": rng.normal(size=(6, 7)).astype(np.float32),
            "action": np.concatenate(
                [rng.normal(size=(6, 6)),
                 rng.choice([0.0, 1.0], size=(6, 1))], 1).astype(np.float32),
            "language": "wipe the table",
            "file_path": f"b/t{i}", "episode_id": i} for i in range(2)]
    write_episodes(tmp_path / "bridge_orig-train-0.tfrecord", eps)

    tok = ByteLevelTokenizer()
    ds = RLDSIterableDataset(
        tmp_path, "bridge", RLDSBatchTransform(ActionTokenizer(tok), tok),
        shuffle_buffer_size=4)
    it = iter(ds)
    for _ in range(3):
        s = next(it)
        assert s["image"].shape == (32, 32, 3)
        assert (np.asarray(s["labels"]) != IGNORE_INDEX).sum() == 8
    assert "bridge_orig" in ds.dataset_statistics
