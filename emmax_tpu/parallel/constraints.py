"""Activation sharding constraints.

GSPMD propagates parameter shardings well but sometimes picks poor layouts
for intermediate reshapes (multi-axis meshes showed "involuntary full
rematerialization" warnings around attention reshapes in dry runs).
``constrain_batch_sharded`` anchors an activation's leading (batch) dim to
the data axes. It is a no-op unless the call is inside a
``jax.sharding.set_mesh`` context whose mesh has those axes — model code
stays mesh-free and single-device paths are untouched.
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P

DATA_AXES = ("replica", "fsdp")


def constrain_batch_sharded(x, data_axes=DATA_AXES):
    """Anchor x's dim 0 to the data axes (inside use_mesh; else identity)."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is None or mesh.empty:
            return x
        axes = tuple(a for a in data_axes if a in mesh.axis_names
                     and mesh.shape[a] > 1)
        if not axes or x.shape[0] % _axes_size(mesh, axes) != 0:
            return x
        spec = P(axes, *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, spec)
    except Exception:
        return x


def _axes_size(mesh, axes) -> int:
    n = 1
    for a in axes:
        n *= mesh.shape[a]
    return n
