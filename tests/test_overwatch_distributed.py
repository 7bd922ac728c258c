"""L0 infra: rank-aware overwatch logging and multi-host bootstrap.

Reference surface: ``/root/reference/prismatic/overwatch/overwatch.py``
(rank gating, rank_zero_only, ctx_level formatting) and its
accelerate/torchrun process-group init (here: ``initialize_distributed``,
single-process no-op) + ``dist.barrier()`` (here: a psum over local
devices)."""

import logging

import numpy as np

from emmax_tpu.overwatch import Overwatch, initialize_overwatch
from emmax_tpu.parallel.distributed import barrier, initialize_distributed


def test_initialize_returns_overwatch_with_rank_context():
    ow = initialize_overwatch("emmax_test")
    assert isinstance(ow, Overwatch)
    # single-process (jax.distributed not initialized): rank 0 of 1
    assert ow.rank() == 0
    assert ow.world_size() == 1
    assert ow.is_rank_zero()


def test_rank_zero_only_runs_on_rank_zero_and_gates_elsewhere(monkeypatch):
    ow = initialize_overwatch("emmax_test")
    calls = []

    @ow.rank_zero_only
    def record(x):
        calls.append(x)
        return x * 2

    assert record(3) == 6 and calls == [3]
    # simulate a non-zero rank: the wrapped fn must not run
    monkeypatch.setattr("emmax_tpu.overwatch._jax_rank_world", lambda: (1, 4))
    assert ow.rank() == 1 and ow.world_size() == 4
    assert record(5) is None
    assert calls == [3]


def test_log_messages_gated_by_rank_and_ctx_formatted(monkeypatch, caplog):
    ow = initialize_overwatch("emmax_test_fmt")
    ow.logger.propagate = True          # let caplog capture
    with caplog.at_level(logging.INFO, logger="emmax_test_fmt"):
        ow.info("top", ctx_level=0)
        ow.info("nested", ctx_level=2)
    assert "top" in caplog.text
    assert "    =>> nested" in caplog.text

    caplog.clear()
    monkeypatch.setattr("emmax_tpu.overwatch._jax_rank_world", lambda: (2, 4))
    with caplog.at_level(logging.INFO, logger="emmax_test_fmt"):
        ow.info("rank0-only message")
        ow.info("everywhere", all_ranks=True)
    assert "rank0-only message" not in caplog.text
    assert "everywhere" in caplog.text


def test_initialize_distributed_single_process_noop():
    # no COORDINATOR_ADDRESS / pod env: must not raise, returns index 0
    assert initialize_distributed() == 0


def test_barrier_runs_on_local_devices():
    barrier("test")  # psum over the 8 virtual CPU devices; completes
    assert True


def test_env_log_level_respected(monkeypatch):
    monkeypatch.setenv("EMMAX_LOG_LEVEL", "ERROR")
    ow = initialize_overwatch("emmax_test_lvl")
    assert ow.logger.level == logging.ERROR
