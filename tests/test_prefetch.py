"""Async device prefetch."""

import numpy as np
import pytest

from emmax_tpu.data.prefetch import PrefetchingLoader, prefetch_to_device


class _Loader:
    def __init__(self, n):
        self.n = n

    def epoch(self, epoch=0):
        for i in range(self.n):
            yield {"input_ids": np.full((2, 4), i, np.int32)}

    def __len__(self):
        return self.n


def test_prefetch_preserves_order_and_values():
    batches = list(prefetch_to_device(_Loader(5).epoch(), mesh=None, depth=2))
    assert len(batches) == 5
    for i, b in enumerate(batches):
        assert (np.asarray(b["input_ids"]) == i).all()


def test_prefetch_with_mesh_places_on_devices():
    from emmax_tpu.parallel import make_mesh

    mesh = make_mesh((1, 8, 1))
    loader = PrefetchingLoader(_Loader(3), mesh)
    out = list(loader.epoch(0))
    assert len(out) == 3
    assert hasattr(out[0]["input_ids"], "sharding")
    assert len(loader) == 3


def test_prefetch_propagates_producer_errors():
    def bad_iter():
        yield {"x": np.zeros(2)}
        raise ValueError("boom")

    it = prefetch_to_device(bad_iter(), mesh=None)
    next(it)
    with pytest.raises(ValueError, match="boom"):
        next(it)
