"""The pjit-compiled VLA train step.

Replaces the reference training inner loop body
(``/root/reference/prismatic/training/strategies/base_strategy.py:558-628``):
forward (bf16 compute / fp32 master params optional), CE loss on masked
labels, backward, clip, AdamW — all inside one jit; FSDP/TP collectives are
inserted by GSPMD from the sharding annotations (no wrapper classes, no
explicit NCCL calls).

Also computes the in-loop metrics the reference derives from logits
(``base_strategy.py:379-444``): action-token accuracy and L1 on the
continuous decode of action tokens.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from emmax_tpu.models.llama import IGNORE_INDEX
from emmax_tpu.models.vlm import VLMConfig, vlm_forward
from emmax_tpu.training.train_state import TrainState


def action_token_metrics(logits, labels, *, vocab_size: int, n_bins: int = 256):
    """Accuracy/L1 restricted to action-token label positions
    (``base_strategy.py:402-417``). logits cover the fused sequence; labels
    are already fused/shifted-compatible."""
    preds = jnp.argmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    return action_token_metrics_from_preds(preds, labels,
                                           vocab_size=vocab_size,
                                           n_bins=n_bins)


def action_token_metrics_from_preds(preds, labels, *, vocab_size: int,
                                    n_bins: int = 256):
    """Same metrics from precomputed greedy preds [B, L-1] (positions 0..L-2)
    — the memory-lean CE path never materializes logits."""
    targets = labels[:, 1:]
    begin = vocab_size - (n_bins + 1)
    action_mask = (targets > begin) & (targets != IGNORE_INDEX)
    correct = (preds == targets) & action_mask
    denom = jnp.maximum(action_mask.sum(), 1)
    acc = correct.sum() / denom
    # continuous L1 between predicted and target bin centers
    bins = jnp.linspace(-1.0, 1.0, n_bins)
    centers = (bins[:-1] + bins[1:]) / 2.0
    def to_cont(ids):
        d = jnp.clip(vocab_size - ids - 1, 0, n_bins - 2)
        return centers[d]
    l1 = jnp.where(action_mask, jnp.abs(to_cont(preds) - to_cont(targets)), 0.0)
    l1 = l1.sum() / denom
    return acc, l1


def make_train_step(cfg: VLMConfig, tx: optax.GradientTransformation, *,
                    attn_impl: str = "xla", remat: bool = True,
                    stop_vision_gradient: bool = False,
                    compute_dtype=jnp.bfloat16,
                    grad_accum_steps: int = 1,
                    transforms: Optional[Dict] = None,
                    action_vocab_size: Optional[int] = None,
                    freeze_mask: Optional[Dict] = None,
                    ce_chunk: Optional[int] = None):
    """Returns ``train_step(state, batch) -> (state, metrics)`` ready to jit.

    ``freeze_mask`` (optional): the ``trainable_mask(params, stage)`` tree.
    Leaves that are ENTIRELY frozen (mask all-zero) are excluded from
    differentiation — their gradients are never computed or materialized
    (scalar-zero placeholders feed the optimizer, whose ``set_to_zero``
    branch holds no state for them). Without this, fine-tuning a frozen 7B
    backbone materializes a params-sized gradient tree (13.5 GB) just to
    mask it: align-stage at 7B OOMs a 16 GB chip. Partially-frozen leaves
    (last-layer stages) keep the multiply-mask path.

    ``batch``: {"input_ids", "attention_mask", "labels"} plus either
    ``"pixel_values": {tower: [B, H, W, 3]}`` (pre-normalized) or — when
    ``transforms`` (tower → ImageTransformConfig) is given — raw uint8
    ``"images": [B, H, W, 3]``, resized/normalized ON DEVICE so only one
    uint8 frame crosses host→HBM per sample. With ``grad_accum_steps > 1``
    the batch's leading dim must be ``accum * micro`` and a ``lax.scan``
    accumulates grads (reference grad accumulation, ``base_strategy.py:259-263``).
    """

    def _pixel_values(batch):
        if "pixel_values" in batch:
            return batch["pixel_values"]
        from emmax_tpu.ops.image import preprocess_for_towers

        pv = preprocess_for_towers(batch["images"], transforms)
        return {k: v.astype(compute_dtype) for k, v in pv.items()}

    def loss_fn(params, batch):
        cparams = jax.tree_util.tree_map(
            lambda a: a.astype(compute_dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
        logits, loss, _ = vlm_forward(
            cparams, cfg, batch["input_ids"], _pixel_values(batch),
            mask=batch["attention_mask"], labels=batch["labels"],
            attn_impl=attn_impl, remat=remat,
            stop_vision_gradient=stop_vision_gradient,
            multimodal_mask=batch.get("multimodal_mask"),
            ce_chunk=ce_chunk,
            # fence per-layer weight slices in the llm layer scan: without
            # it reverse-mode AD hoists layout-transposed copies of the
            # WHOLE stacked wq/wk/wv (3 x 1.00 GB HLO temps at 7B) out of
            # the backward loop — the 7B align step then exceeds 16 GB.
            # Identity on values; same total transpose work per step.
            scan_weight_barrier=True)
        # fused labels for metrics: recompute cheaply from logits shape
        P = logits.shape[1] - batch["input_ids"].shape[1]
        fused_labels = jnp.concatenate(
            [batch["labels"][:, :1],
             jnp.full((batch["labels"].shape[0], P), IGNORE_INDEX,
                      batch["labels"].dtype),
             batch["labels"][:, 1:]], axis=1)
        # Action-token ids anchor to the tokenizer's BASE vocab (32000 for
        # Llama-2), not the padded embedding-row count (32064) — the
        # reference metric uses tokenizer.vocab_size
        # (base_strategy.py:402-417, action_tokenizer.py:34-36).
        if ce_chunk:
            # lean path: `logits` already holds greedy preds [B, F]
            acc, l1 = action_token_metrics_from_preds(
                logits[:, :-1], fused_labels,
                vocab_size=action_vocab_size or cfg.llm.vocab_size)
        else:
            acc, l1 = action_token_metrics(
                logits, fused_labels,
                vocab_size=action_vocab_size or cfg.llm.vocab_size)
        return loss, {"action_accuracy": acc, "action_l1": l1}

    # leaves to exclude from differentiation entirely (host-side decision)
    _frozen_leaf = None
    if freeze_mask is not None:
        import numpy as _np

        _frozen_leaf = jax.tree_util.tree_map(
            lambda m: bool(_np.all(_np.asarray(m) == 0)), freeze_mask)

    _plain_grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def grad_fn(params, batch):
        if _frozen_leaf is None:
            return _plain_grad_fn(params, batch)
        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_frozen = jax.tree_util.tree_leaves(_frozen_leaf)
        train_idx = [i for i, fz in enumerate(flat_frozen) if not fz]

        def loss_from_subset(sub, flat_all, batch):
            merged = list(flat_all)
            for i, v in zip(train_idx, sub):
                merged[i] = v
            return loss_fn(jax.tree_util.tree_unflatten(treedef, merged),
                           batch)

        sub = [flat_p[i] for i in train_idx]
        (loss, aux), sub_grads = jax.value_and_grad(
            loss_from_subset, has_aux=True)(sub, flat_p, batch)
        grads_flat = [jnp.zeros((), leaf.dtype) for leaf in flat_p]
        for i, g in zip(train_idx, sub_grads):
            grads_flat[i] = g
        return (loss, aux), jax.tree_util.tree_unflatten(treedef, grads_flat)

    def single_step(state: TrainState, batch):
        (loss, aux), grads = grad_fn(state.params, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = {"loss": loss, "grad_norm": gnorm, **aux}
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt), metrics

    if grad_accum_steps == 1:
        return single_step

    def accum_step(state: TrainState, batch):
        def micro(carry, micro_batch):
            g_acc, loss_acc, aux_acc = carry
            (loss, aux), grads = grad_fn(state.params, micro_batch)
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
            loss_acc = loss_acc + loss
            aux_acc = jax.tree_util.tree_map(jnp.add, aux_acc, aux)
            return (g_acc, loss_acc, aux_acc), None

        def reshape(a):
            return a.reshape(grad_accum_steps, a.shape[0] // grad_accum_steps,
                             *a.shape[1:])

        micro_batches = jax.tree_util.tree_map(reshape, batch)
        # accumulator must MIRROR grad_fn's output structure: frozen leaves
        # carry scalar placeholder grads, and a full-shape zeros_like init
        # would broadcast them back to param shape on the first add —
        # re-materializing the frozen-gradient tree (13.5 GB at 7B) the
        # subset-differentiation path exists to avoid
        if _frozen_leaf is not None:
            flat_p, treedef = jax.tree_util.tree_flatten(state.params)
            flat_frozen = jax.tree_util.tree_leaves(_frozen_leaf)
            zeros = jax.tree_util.tree_unflatten(treedef, [
                jnp.zeros((), p.dtype) if fz else jnp.zeros_like(p)
                for p, fz in zip(flat_p, flat_frozen)])
        else:
            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        init = (zeros, jnp.zeros(()),
                {"action_accuracy": jnp.zeros(()), "action_l1": jnp.zeros(())})
        (grads, loss, aux), _ = jax.lax.scan(micro, init, micro_batches)
        scale = 1.0 / grad_accum_steps
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss * scale,
                   "grad_norm": optax.global_norm(grads),
                   **jax.tree_util.tree_map(lambda a: a * scale, aux)}
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt), metrics

    return accum_step


def jit_train_step(step_fn, donate: bool = True, mesh=None):
    """Jit the step; shardings propagate from the (device_put) input state
    and batch placements — GSPMD inserts the FSDP/TP collectives.

    With ``mesh``, tracing runs under ``jax.sharding.set_mesh`` so the
    activation anchors in the model (``parallel/constraints.py``) engage.
    """
    jitted = jax.jit(step_fn, donate_argnums=(0,) if donate else ())
    if mesh is None:
        return jitted

    def wrapped(state, batch):
        with jax.sharding.set_mesh(mesh):
            return jitted(state, batch)

    return wrapped
