"""Device mesh construction.

The TPU-native replacement for the reference's torch FSDP process groups
(``/root/reference/prismatic/training/strategies/fsdp.py:84-93``): a
``jax.sharding.Mesh`` with named axes

- ``replica`` — pure data parallel (maps to DCN between pod slices; the
  reference's HYBRID_SHARD replica group),
- ``fsdp``    — fully-sharded parameter axis over ICI (the reference's
  FULL_SHARD / SHARD_GRAD_OP group),
- ``tensor``  — megatron-style tensor parallelism over ICI (absent in the
  reference — an Emma-X-on-TPU extension).

``-1`` in the shape consumes all remaining devices.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

AXIS_NAMES = ("replica", "fsdp", "tensor")


def resolve_mesh_shape(shape: Sequence[int], n_devices: int) -> Tuple[int, ...]:
    shape = list(shape)
    known = int(np.prod([s for s in shape if s != -1]))
    if -1 in shape:
        assert shape.count(-1) == 1, "at most one -1 axis"
        assert n_devices % known == 0, (n_devices, shape)
        shape[shape.index(-1)] = n_devices // known
    assert int(np.prod(shape)) == n_devices, (
        f"mesh {shape} != {n_devices} devices")
    return tuple(shape)


def make_mesh(shape: Sequence[int] = (1, -1, 1),
              axis_names: Sequence[str] = AXIS_NAMES,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    resolved = resolve_mesh_shape(shape, len(devices))
    dev_array = np.asarray(devices).reshape(resolved)
    return Mesh(dev_array, tuple(axis_names))


def strategy_to_mesh_shape(train_strategy: str, n_devices: int,
                           n_hosts: int = 1) -> Tuple[int, int, int]:
    """Map the reference ``train_strategy`` strings (conf/vla.py:51) onto mesh
    shapes: full-shard → all devices on fsdp; shard-grad-op (ZeRO-2 hybrid,
    fsdp.py:84-89) → shard within host, replicate across hosts; ddp → pure
    replica."""
    if train_strategy in ("fsdp-full-shard", "fsdp"):
        return (1, n_devices, 1)
    if train_strategy == "fsdp-shard-grad-op":
        per = max(n_devices // max(n_hosts, 1), 1)
        return (n_devices // per, per, 1)
    if train_strategy == "ddp":
        return (n_devices, 1, 1)
    raise ValueError(f"unknown train strategy {train_strategy!r}")
