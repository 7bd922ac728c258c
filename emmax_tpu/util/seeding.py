"""Deterministic seeding.

Counterpart of ``/root/reference/prismatic/util/torch_utils.py:30-95``:
``set_global_seed`` with SeedSequence-spawned per-worker generators (the
reference's DataLoader ``worker_init_function``), plus the capability check
(the NCCL/bf16 gate becomes a TPU bf16 availability check — always true on
TPU).
"""

from __future__ import annotations

import os
import random
from typing import Callable, Optional

import numpy as np


def set_global_seed(seed: int, get_worker_init_fn: bool = False
                    ) -> Optional[Callable[[int], None]]:
    assert np.iinfo(np.uint32).min < seed < np.iinfo(np.uint32).max
    os.environ["EXPERIMENT_GLOBAL_SEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)
    return worker_init_function if get_worker_init_fn else None


def worker_init_function(worker_id: int) -> None:
    """Derive a unique, deterministic stream per data worker
    (SeedSequence spawning, ``torch_utils.py:44-74``)."""
    global_seed = int(os.environ["EXPERIMENT_GLOBAL_SEED"])
    base_seq = np.random.SeedSequence([global_seed, worker_id])
    np.random.seed(base_seq.generate_state(4))
    random.seed(int(base_seq.generate_state(1)[0]))


def make_worker_rng(seed: int, worker_id: int, epoch: int = 0
                    ) -> np.random.Generator:
    """Stateless per-(worker, epoch) generator for the data pipeline."""
    return np.random.default_rng(
        np.random.SeedSequence([seed, worker_id, epoch]))


def check_bloat16_supported() -> bool:
    """TPU always supports bf16 (the reference gates on CUDA 11 + NCCL 2.10,
    ``torch_utils.py:80-95``)."""
    try:
        import jax

        return jax.devices()[0].platform in ("tpu", "cpu", "gpu")
    except Exception:
        return False
