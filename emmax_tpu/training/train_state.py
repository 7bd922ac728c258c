"""Train state: params + optimizer + schedules + freeze-stage masks.

Replaces the reference ``TrainingStrategy`` optimizer setup
(``/root/reference/prismatic/training/strategies/fsdp.py:191-249``: AdamW
with decay/no-decay groups, constant or linear-warmup+cosine-decay schedule)
and ``PrismaticVLM.freeze_backbones``
(``prismatic/models/vlms/prismatic.py:133-245``) — freezing is a per-leaf
0/1 gradient mask, which also handles the stacked-layer "last LLM layer
only" stages (``llama2.py:101-102``) by masking along the layer axis.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

Params = Any


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Params
    opt_state: Any


# --- freeze stages -----------------------------------------------------------

def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def trainable_mask(params: Params, stage: str) -> Params:
    """Per-leaf BROADCASTABLE host mask — 1.0 where trainable.

    Uniform leaves get numpy scalars and last-layer stages a
    ``[L, 1, ...]`` column, NOT full-shape arrays: full fp32 masks would
    materialize a params-sized tree (28 GB at 7B) and, on a remote-compile
    backend, one device dispatch/compile per leaf shape. Broadcasting in
    ``grad * mask`` keeps the math identical.

    Stages mirror ``freeze_backbones`` exactly (align / finetune / vla-train /
    full-finetune / vla-full-train / last-layer-finetune /
    vla-last-layer-train / vla-sandwich-train).
    """
    import numpy as np

    def leaf_mask(path, leaf):
        p = _path_str(path)
        vision = p.startswith("vision")
        projector = p.startswith("projector")
        llm = p.startswith("llm")
        is_llm_layers = p.startswith("llm/layers")
        is_llm_embed = p in ("llm/embed", "llm/lm_head")

        def last_layer_only():
            # embed + lm_head + final layer of the stacked axis
            if is_llm_embed:
                return np.float32(1.0)
            if is_llm_layers:
                L = leaf.shape[0]
                m = np.zeros((L,) + (1,) * (len(leaf.shape) - 1), np.float32)
                m[-1] = 1.0
                return m
            return np.float32(0.0)

        if stage == "align":
            on = projector
        elif stage in ("finetune", "vla-train"):
            on = projector or llm
        elif stage in ("full-finetune", "vla-full-train"):
            on = True
        elif stage in ("last-layer-finetune", "vla-last-layer-train"):
            return last_layer_only() if llm else np.float32(0.0)
        elif stage == "vla-sandwich-train":
            if llm:
                return last_layer_only()
            on = vision or projector
        else:
            raise ValueError(f"unsupported stage {stage!r}")
        return np.float32(1.0 if on else 0.0)

    return jax.tree_util.tree_map_with_path(leaf_mask, params)


def stage_from_flags(freeze_vision: bool, freeze_llm: bool,
                     unfreeze_last_llm_layer: bool) -> str:
    """Reference flag → stage mapping (``vla-scripts/train.py:171-187``)."""
    if not freeze_vision and not freeze_llm:
        return "vla-full-train"
    if freeze_vision and not freeze_llm:
        return "vla-train"
    if freeze_vision and freeze_llm and unfreeze_last_llm_layer:
        return "vla-last-layer-train"
    if not freeze_vision and freeze_llm and unfreeze_last_llm_layer:
        return "vla-sandwich-train"
    raise ValueError("invalid freeze combination "
                     f"({freeze_vision=}, {freeze_llm=}, {unfreeze_last_llm_layer=})")


# --- schedules / optimizer ---------------------------------------------------

def make_schedule(kind: str, learning_rate: float, total_steps: int,
                  warmup_ratio: float = 0.03) -> optax.Schedule:
    """"constant" | "linear-warmup+cosine-decay" (fsdp.py:199-249)."""
    if kind == "constant":
        return optax.constant_schedule(learning_rate)
    if kind == "linear-warmup+cosine-decay":
        warmup = max(int(total_steps * warmup_ratio), 1)
        return optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup, max(total_steps, warmup + 1),
            end_value=0.0)
    raise ValueError(f"unknown lr schedule {kind!r}")


def _decay_mask(params: Params) -> Params:
    """AdamW weight decay applies to matmul weights only — biases, norms,
    layerscale, tokens excluded (reference decay/no-decay split,
    fsdp.py:199-230)."""
    def m(path, leaf):
        p = _path_str(path)
        no_decay = any(t in p for t in
                       ("norm", "bias", "ls1", "ls2", "cls_token",
                        "reg_tokens", "pos_embed"))
        return not no_decay and getattr(leaf, "ndim", 0) >= 2

    return jax.tree_util.tree_map_with_path(m, params)


def make_optimizer(params: Params, *, learning_rate: float,
                   weight_decay: float, max_grad_norm: float,
                   lr_scheduler_type: str, total_steps: int,
                   warmup_ratio: float = 0.03,
                   stage: str = "vla-full-train"
                   ) -> tuple[optax.GradientTransformation, Callable]:
    schedule = make_schedule(lr_scheduler_type, learning_rate, total_steps,
                             warmup_ratio)
    mask = trainable_mask(params, stage)
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.multi_transform(
            {"train": optax.adamw(schedule, b1=0.9, b2=0.999,
                                  weight_decay=weight_decay,
                                  mask=_decay_mask),
             "freeze": optax.set_to_zero()},
            param_labels=jax.tree_util.tree_map(
                # host-side: jnp.any per leaf costs a device round trip
                # (and a per-shape remote compile) for every parameter
                lambda m: "train" if bool(__import__("numpy").any(m))
                else "freeze", mask)),
    )
    # per-leaf partial-freeze (last-layer stages): mask the grads up front
    # AND the final updates. The trailing mask is load-bearing — a stacked
    # leaf with ANY trainable layer is labeled "train", so adamw's
    # add_decayed_weights emits -lr*wd*param for its FROZEN layers too
    # (zeroed grads keep the moments clean, but decay reads params);
    # without the trailing mask, "frozen" backbone layers decay toward
    # zero every step (regression:
    # test_data_and_loop.py::test_frozen_params_not_decayed).
    freeze_grads = jax.tree_util.tree_map(lambda m: m, mask)
    tx = optax.chain(_mask_grads(freeze_grads), tx,
                     _mask_grads(freeze_grads))
    return tx, schedule


def _mask_grads(mask_tree: Params) -> optax.GradientTransformation:
    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        return (jax.tree_util.tree_map(
            lambda g, m: g * m.astype(g.dtype), updates, mask_tree), state)

    return optax.GradientTransformation(init, update)


def create_train_state(params: Params, tx: optax.GradientTransformation
                       ) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))
