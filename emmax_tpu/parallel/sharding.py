"""GSPMD sharding rules for the VLM parameter tree.

The "distributed backend" of this framework is: mesh definition
(``parallel/mesh.py``) + these PartitionSpec rules + XLA-inserted collectives
— replacing the reference's NCCL/FSDP wrapper machinery
(``/root/reference/prismatic/training/strategies/fsdp.py:138-186``,
wrap policies at ``models/vlms/prismatic.py:289-310``).

Rules (path-pattern → PartitionSpec), megatron-style TP + ZeRO-3-style FSDP:

- attention qkv / mlp up projections ``[L, D_in, D_out]``: in-dim on
  ``fsdp``, out-dim (heads / hidden) on ``tensor``.
- attention out / mlp down projections: transposed — out on ``fsdp``,
  in on ``tensor``.
- embeddings / lm_head: vocab on ``tensor``, model dim on ``fsdp``.
- norms, biases, layerscale, cls/reg/pos tokens: replicated.
- batch axis of data: sharded over ``("replica", "fsdp")``.

With mesh (1, N, 1) this reduces exactly to FSDP full-shard semantics
(params all-gathered per layer by XLA, grads reduce-scattered); with
(1, N/t, t) it is FSDP+TP.
"""

from __future__ import annotations

import re
from typing import Any, List, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

# (regex over "/"-joined path, spec). First match wins. Specs may name axes
# that a given leaf lacks — trimmed to leaf rank from the left.
_RULES: List[Tuple[str, P]] = [
    # --- LLM ---
    (r"llm/embed$", P("tensor", "fsdp")),
    (r"llm/lm_head$", P("fsdp", "tensor")),
    (r"llm/layers/(wq|wk|wv)$", P(None, "fsdp", "tensor")),
    (r"llm/layers/wo$", P(None, "tensor", "fsdp")),
    (r"llm/layers/(w_gate|w_up)$", P(None, "fsdp", "tensor")),
    (r"llm/layers/w_down$", P(None, "tensor", "fsdp")),
    (r"llm/layers/(attn_norm|mlp_norm)$", P()),
    (r"llm/final_norm$", P()),
    # --- ViT towers ---
    (r"vision/.*/patch_embed/kernel$", P("fsdp", "tensor")),
    (r"vision/.*/blocks/wqkv$", P(None, "fsdp", "tensor")),
    (r"vision/.*/blocks/wo$", P(None, "tensor", "fsdp")),
    (r"vision/.*/blocks/w1$", P(None, "fsdp", "tensor")),
    (r"vision/.*/blocks/w2$", P(None, "tensor", "fsdp")),
    (r"vision/.*/(pos_embed|cls_token|reg_tokens)$", P()),
    (r"vision/.*", P()),          # biases, norms, layerscale
    # --- projector ---
    (r"projector/layers/\d+/kernel$", P("fsdp", "tensor")),
    (r"projector/.*", P()),
    # --- fallback ---
    (r".*", P()),
]


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def spec_for_path(path_str: str, ndim: int, mesh: Mesh) -> P:
    for pattern, spec in _RULES:
        if re.fullmatch(pattern, path_str):
            return _fit_spec(spec, ndim, mesh)
    return P()


def _fit_spec(spec: P, ndim: int, mesh: Mesh) -> P:
    """Trim/pad the spec to the leaf rank and drop axes that don't divide."""
    entries = list(spec)
    entries = entries[:ndim] + [None] * (ndim - len(entries))
    # drop trivial mesh axes (size 1) for cleanliness
    out = []
    for e in entries:
        if e is None:
            out.append(None)
        else:
            size = int(np.prod([mesh.shape[a] for a in
                                (e if isinstance(e, tuple) else (e,))]))
            out.append(e if size > 1 else None)
    return P(*out)


def param_partition_specs(params: Any, mesh: Mesh) -> Any:
    """PartitionSpec pytree mirroring ``params``; leaves whose annotated axis
    doesn't divide the dimension fall back to replication on that axis."""

    def leaf_spec(path, leaf):
        ps = _path_str(path)
        spec = spec_for_path(ps, getattr(leaf, "ndim", 0), mesh)
        shape = getattr(leaf, "shape", ())
        fixed = []
        for dim, e in zip(shape, list(spec)):
            if e is None:
                fixed.append(None)
                continue
            size = int(np.prod([mesh.shape[a] for a in
                                (e if isinstance(e, tuple) else (e,))]))
            fixed.append(e if dim % size == 0 else None)
        return P(*fixed)

    return jax.tree_util.tree_map_with_path(leaf_spec, params)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        param_partition_specs(params, mesh),
        is_leaf=lambda x: isinstance(x, P))


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a (host or single-device) param tree onto the mesh."""
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, s), params, shardings)


def batch_sharding(mesh: Mesh, ndim: int = 2,
                   batch_dim_size: Optional[int] = None) -> NamedSharding:
    """Data batches: batch dim over (replica, fsdp), rest replicated.
    Falls back to replication when the batch doesn't divide the data axes
    (e.g. tiny smoke batches)."""
    dp = mesh.shape["replica"] * mesh.shape["fsdp"]
    if ndim == 0:                      # scalar leaf: replicate
        return NamedSharding(mesh, P())
    if batch_dim_size is not None and batch_dim_size % dp != 0:
        return NamedSharding(mesh, P(*([None] * ndim)))
    return NamedSharding(mesh, P(("replica", "fsdp"), *([None] * (ndim - 1))))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch onto the mesh.

    Single-process: ONE batched device_put for the whole tree (per-leaf puts
    cost one relay dispatch each, ~28 ms on the remote-TPU relay, every step).

    Multi-process (``jax.process_count() > 1``): each process passes its OWN
    per-host shard of the global batch — produced by the loaders'
    ``num_shards=process_count, shard_index=process_index`` wiring
    (``vla-scripts/train.py``, ``scripts/pretrain.py``) — and the shards are
    assembled into one global ``jax.Array`` with
    ``jax.make_array_from_process_local_data``. This is the TPU-native
    replacement for the reference's per-rank ``DistributedSampler`` feeding
    (``/root/reference/prismatic/training/strategies/base_strategy.py:507-520``).
    """
    if jax.process_count() > 1:
        return _shard_batch_multiprocess(batch, mesh)
    shardings = jax.tree_util.tree_map(
        lambda a: batch_sharding(mesh, getattr(a, "ndim", 1),
                                 a.shape[0] if getattr(a, "ndim", 0)
                                 else None),
        batch)
    return jax.device_put(batch, shardings)


def _shard_batch_multiprocess(batch: Any, mesh: Mesh) -> Any:
    nproc = jax.process_count()
    dp = mesh.shape["replica"] * mesh.shape["fsdp"]

    def make(a):
        a = np.asarray(a)
        if a.ndim == 0:
            # scalar leaf (identical on every host): fully replicated
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, P()), a, a.shape)
        global_b = a.shape[0] * nproc
        if global_b % dp != 0:
            raise ValueError(
                f"multi-process batch: global batch {global_b} "
                f"(= {a.shape[0]} local x {nproc} processes) must divide the "
                f"data-parallel mesh extent {dp}; pad the per-host batch")
        sharding = batch_sharding(mesh, a.ndim, global_b)
        return jax.make_array_from_process_local_data(
            sharding, a, (global_b,) + a.shape[1:])

    return jax.tree_util.tree_map(make, batch)
