"""Multi-host initialization.

The TPU-native replacement for the reference's torchrun + accelerate
``PartialState`` process-group bootstrap
(``/root/reference/prismatic/overwatch/overwatch.py:47-92``): on a TPU pod
slice each host calls ``initialize_distributed()`` once before building the
mesh; JAX's coordinator discovers topology from the TPU runtime (or from the
standard ``COORDINATOR_ADDRESS``/``NUM_PROCESSES``/``PROCESS_ID`` env vars
off-TPU). Safe to call when single-process (no-op).
"""

from __future__ import annotations

import os
from typing import Optional

from emmax_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Initialize jax.distributed if a multi-host context is detected.

    Returns the process index."""
    import jax

    env_addr = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    env_n = num_processes or int(os.environ.get("NUM_PROCESSES", "0")) or None
    on_tpu_pod = any(k in os.environ for k in
                     ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"))
    try:
        if env_addr is not None:
            jax.distributed.initialize(
                coordinator_address=env_addr,
                num_processes=env_n,
                process_id=(process_id if process_id is not None
                            else int(os.environ.get("PROCESS_ID", "0"))))
        elif on_tpu_pod and os.environ.get("TPU_WORKER_HOSTNAMES", "") not in \
                ("", "localhost"):
            jax.distributed.initialize()  # auto-discovery on TPU pods
    except RuntimeError as e:
        # already initialized, or single-process
        overwatch.debug(f"jax.distributed.initialize skipped: {e}")
    idx = jax.process_index()
    overwatch.info(f"process {idx}/{jax.process_count()}, "
                   f"{jax.local_device_count()} local devices", all_ranks=True)
    return idx


def barrier(name: str = "barrier") -> None:
    """Cross-host sync point (reference ``dist.barrier()`` at checkpoints,
    ``base_strategy.py:281,478``): a tiny psum over all devices."""
    import jax
    import jax.numpy as jnp

    jax.block_until_ready(
        jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
            jnp.ones((jax.local_device_count(),))))
