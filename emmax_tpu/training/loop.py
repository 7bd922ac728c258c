"""Training loops.

Counterpart of ``TrainingStrategy.run_discrete_vla_training``
(``/root/reference/prismatic/training/strategies/base_strategy.py:490-662``):
epoch loop over the GCOT dataset with

- the jitted sharded train step (GSPMD collectives instead of FSDP wrappers),
- teacher-forced Solver evaluation every ``eval_every`` steps (:581-603),
- checkpoints every ``save_every`` steps / at ``max_steps`` / at epoch end
  (:605-615,641-661), including optimizer state (improvement over the
  reference, which restores weights only),
- metrics committed per step and pushed via trackers.

``run_training`` (VLM align/finetune stages, :157-292) reuses the same body
with grad accumulation handled inside the train step.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from emmax_tpu.models.llama import IGNORE_INDEX
from emmax_tpu.models.vlm import VLMConfig, vlm_forward
from emmax_tpu.overwatch import initialize_overwatch
from emmax_tpu.parallel.sharding import shard_batch
from emmax_tpu.training.metrics import VLADiscreteMetrics

overwatch = initialize_overwatch(__name__)


@dataclasses.dataclass
class LoopConfig:
    epochs: int = 1
    max_steps: Optional[int] = None
    eval_every: int = 200
    save_every: int = 1000
    log_every: int = 10


def make_eval_fn(cfg: VLMConfig, *, transforms=None, attn_impl: str = "xla",
                 compute_dtype=jnp.bfloat16):
    """Jitted teacher-forced argmax predictions for the current batch."""

    @jax.jit
    def eval_fn(params, batch):
        cparams = jax.tree_util.tree_map(
            lambda a: a.astype(compute_dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
        if "pixel_values" in batch:
            pv = batch["pixel_values"]
        else:
            from emmax_tpu.ops.image import preprocess_for_towers

            pv = {k: v.astype(compute_dtype) for k, v in
                  preprocess_for_towers(batch["images"], transforms).items()}
        logits, _, _ = vlm_forward(cparams, cfg, batch["input_ids"], pv,
                                   mask=batch["attention_mask"],
                                   attn_impl=attn_impl)
        return jnp.argmax(logits.astype(jnp.float32), axis=-1)

    return eval_fn


def teacher_forced_texts(preds: np.ndarray, labels: np.ndarray,
                         num_patches: int, tokenizer):
    """Decode (gt, pred) text pairs at supervised positions.

    ``preds`` covers the fused sequence [bos|patches|text[1:]]; ``labels``
    is the un-fused [B, L] label array. Position ``t`` of the fused sequence
    predicts fused position ``t+1`` (shift inside the loss) — mirrors the
    argmax-decode eval at ``base_strategy.py:581-603``.
    """
    gt_texts, pred_texts = [], []
    B, L = labels.shape
    for b in range(B):
        fused_labels = np.concatenate(
            [labels[b, :1], np.full(num_patches, IGNORE_INDEX), labels[b, 1:]])
        idx = np.nonzero(fused_labels != IGNORE_INDEX)[0]
        # label at fused position i is predicted at i-1; a supervised
        # position 0 has no predictor (idx-1 would WRAP to the last
        # position) — drop it rather than pair it with garbage
        idx = idx[idx > 0]
        gt_texts.append(tokenizer.decode(fused_labels[idx].tolist()))
        pred_texts.append(tokenizer.decode(preds[b, idx - 1].tolist()))
    return gt_texts, pred_texts


def run_discrete_vla_training(
    *,
    vlm_cfg: VLMConfig,
    state,
    train_step: Callable,
    loader,
    metrics: VLADiscreteMetrics,
    loop_cfg: LoopConfig,
    mesh=None,
    tokenizer=None,
    solver=None,
    eval_fn: Optional[Callable] = None,
    ckpt_manager=None,
    lr_fn: Optional[Callable[[int], float]] = None,
    start_step: int = 0,
    start_epoch: int = 0,
):
    """Returns the final state. ``loader.epoch(e)`` yields collated batches;
    string-label fields are kept on host."""
    step = start_step
    final_loss = float("nan")
    for epoch in range(start_epoch, loop_cfg.epochs):
        for batch in loader.epoch(epoch):
            labels = batch["labels"]
            # lazy: D2H copy only on solver-eval steps
            get_host_labels = (
                (lambda l=labels: np.asarray(l))
                if not isinstance(labels, (list, tuple)) else lambda: None)
            device_batch = {k: v for k, v in batch.items()
                            if isinstance(v, np.ndarray) or hasattr(v, "shape")
                            or isinstance(v, dict)}
            device_batch.pop("multimodal_indices", None)  # host-side only
            if mesh is not None:
                # no-op for batches already placed by a prefetching loader
                device_batch = shard_batch(device_batch, mesh)
            state, m = train_step(state, device_batch)
            step += 1
            m = jax.device_get(m)   # ONE fetch (4 scalar floats cost 4
            #                         ~30 ms relay round-trips otherwise)
            final_loss = float(m["loss"])
            metrics.commit(loss=final_loss,
                           action_accuracy=float(m.get("action_accuracy", 0)),
                           action_l1=float(m.get("action_l1", 0)),
                           grad_norm=float(m.get("grad_norm", 0)))

            lr = float(lr_fn(step)) if lr_fn is not None else 0.0
            if step % loop_cfg.log_every == 0:
                metrics.push(lr)
                overwatch.info(metrics.status(epoch, lr))
            else:
                metrics.global_step += 1

            if (solver is not None and eval_fn is not None
                    and step % loop_cfg.eval_every == 0
                    and (host_labels := get_host_labels()) is not None):
                preds = np.asarray(eval_fn(state.params, device_batch))
                gts, prs = teacher_forced_texts(
                    preds, host_labels, vlm_cfg.num_patches, tokenizer)
                s_acc, a_acc, l1, rel_l1, _, _ = solver.evaluate_batch(gts, prs)
                metrics.commit(solver_action_accuracy=float(np.mean(a_acc)),
                               solver_l1=float(np.mean(l1)),
                               solver_relative_l1=float(np.mean(rel_l1)))
                overwatch.info(
                    f"[solver eval @ {step}] acc={np.mean(a_acc):.3f} "
                    f"L1={np.mean(l1):.4f}")

            if ckpt_manager is not None and step % loop_cfg.save_every == 0:
                ckpt_manager.save(state, step=step, epoch=epoch,
                                  loss=final_loss)
            if loop_cfg.max_steps is not None and step >= loop_cfg.max_steps:
                if ckpt_manager is not None:
                    ckpt_manager.save(state, step=step, epoch=epoch,
                                      loss=final_loss)
                    ckpt_manager.wait()
                return state
        if ckpt_manager is not None:
            ckpt_manager.save(state, step=step, epoch=epoch, loss=final_loss)
    if ckpt_manager is not None:
        ckpt_manager.wait()
    return state


def run_validation(*, vlm_cfg: VLMConfig, params, eval_fn, loader,
                   tokenizer, solver, run_dir, epoch: int = 0) -> dict:
    """Validation pass dumping ``validation_results/epoch_{n}_{rank}.json``
    (reference ``base_strategy.py:114-155``): teacher-forced predictions +
    Solver metrics over the val loader."""
    import json
    from pathlib import Path

    import jax

    records = []
    accs, l1s = [], []
    for batch in loader.epoch(epoch):
        labels = batch["labels"]
        host_labels = (np.asarray(labels)
                       if not isinstance(labels, (list, tuple)) else None)
        if host_labels is None:
            continue
        device_batch = {k: v for k, v in batch.items()
                        if isinstance(v, np.ndarray) or hasattr(v, "shape")
                        or isinstance(v, dict)}
        preds = np.asarray(eval_fn(params, device_batch))
        gts, prs = teacher_forced_texts(preds, host_labels,
                                        vlm_cfg.num_patches, tokenizer)
        _, a_acc, l1, _, _, _ = solver.evaluate_batch(gts, prs)
        accs.extend(a_acc)
        l1s.extend(l1)
        records.extend({"ground_truth": g, "prediction": p}
                       for g, p in zip(gts, prs))
    out_dir = Path(run_dir) / "validation_results"
    out_dir.mkdir(parents=True, exist_ok=True)
    rank = jax.process_index()
    summary = {"epoch": epoch, "action_accuracy": float(np.mean(accs or [0])),
               "l1": float(np.mean(l1s or [0])), "n": len(records)}
    with open(out_dir / f"epoch_{epoch}_{rank}.json", "w") as f:
        json.dump({"summary": summary, "records": records}, f, indent=2)
    overwatch.info(f"[validation] {summary}")
    return summary


def run_training(*, vlm_cfg: VLMConfig, state, train_step: Callable,
                 loader, metrics, loop_cfg: LoopConfig, mesh=None,
                 ckpt_manager=None, lr_fn=None, start_step: int = 0,
                 start_epoch: int = 0):
    """VLM align/finetune stage loop (reference ``run_training``,
    ``base_strategy.py:157-292``): split-modality batches with mixed
    text-only/multimodal rows. ``loader`` should be a
    ``SplitModalityLoader`` whose ``collate_lm`` batches carry
    ``multimodal_mask``; text-only rows take the unimodal merge inside the
    jitted step (``fuse_multimodal``). Grad accumulation lives inside the
    train step; no Solver eval in this stage."""
    mm_seen = text_seen = 0
    step = start_step
    final_loss = float("nan")
    for epoch in range(start_epoch, loop_cfg.epochs):
        for batch in loader.epoch(epoch):
            if "multimodal_mask" in batch:
                mm = np.asarray(batch["multimodal_mask"])
                mm_seen += int(mm.sum())
                text_seen += int((~mm).sum())
            device_batch = {k: v for k, v in batch.items()
                            if isinstance(v, np.ndarray) or hasattr(v, "shape")
                            or isinstance(v, dict)}
            device_batch.pop("multimodal_indices", None)  # host-side only
            if mesh is not None:
                device_batch = shard_batch(device_batch, mesh)
            state, m = train_step(state, device_batch)
            step += 1
            m = jax.device_get(m)   # one fetch, not one per scalar
            final_loss = float(m["loss"])
            metrics.commit(loss=final_loss,
                           grad_norm=float(m.get("grad_norm", 0)))
            lr = float(lr_fn(step)) if lr_fn is not None else 0.0
            if step % loop_cfg.log_every == 0:
                metrics.push(lr)
                overwatch.info(metrics.status(epoch, lr))
            else:
                metrics.global_step += 1
            if ckpt_manager is not None and step % loop_cfg.save_every == 0:
                ckpt_manager.save(state, step=step, epoch=epoch,
                                  loss=final_loss)
            if loop_cfg.max_steps is not None and step >= loop_cfg.max_steps:
                if ckpt_manager is not None:
                    ckpt_manager.save(state, step=step, epoch=epoch,
                                      loss=final_loss)
                    ckpt_manager.wait()
                overwatch.info(f"[run_training] examples seen: "
                               f"{mm_seen} multimodal / {text_seen} text-only")
                return state
        if ckpt_manager is not None:
            ckpt_manager.save(state, step=step, epoch=epoch, loss=final_loss)
    if ckpt_manager is not None:
        ckpt_manager.wait()
    overwatch.info(f"[run_training] examples seen: "
                   f"{mm_seen} multimodal / {text_seen} text-only")
    return state


def run_vla_training(*, vlm_cfg: VLMConfig, state, train_step: Callable,
                     batch_iter, metrics, max_steps: int,
                     loop_cfg: Optional[LoopConfig] = None, mesh=None,
                     tokenizer=None, solver=None, eval_fn=None,
                     ckpt_manager=None, lr_fn=None, start_step: int = 0):
    """RLDS iterable-stream loop (reference ``run_vla_training``,
    ``base_strategy.py:296-486``): no epochs — consume ``batch_iter`` for
    ``max_steps`` steps (the RLDS interleave repeats forever). Per-step
    action metrics come from the train step; optional Solver eval matches
    the discrete loop."""
    loop_cfg = loop_cfg or LoopConfig()
    step = start_step
    final_loss = float("nan")
    for batch in batch_iter:
        labels = batch["labels"]
        get_host_labels = (
            (lambda l=labels: np.asarray(l))
            if not isinstance(labels, (list, tuple)) else lambda: None)
        device_batch = {k: v for k, v in batch.items()
                        if isinstance(v, np.ndarray) or hasattr(v, "shape")
                        or isinstance(v, dict)}
        if mesh is not None:
            device_batch = shard_batch(device_batch, mesh)
        state, m = train_step(state, device_batch)
        step += 1
        m = jax.device_get(m)       # one fetch, not one per scalar
        final_loss = float(m["loss"])
        metrics.commit(loss=final_loss,
                       action_accuracy=float(m.get("action_accuracy", 0)),
                       action_l1=float(m.get("action_l1", 0)),
                       grad_norm=float(m.get("grad_norm", 0)))
        lr = float(lr_fn(step)) if lr_fn is not None else 0.0
        if step % loop_cfg.log_every == 0:
            metrics.push(lr)
            overwatch.info(metrics.status(0, lr))
        else:
            metrics.global_step += 1
        if (solver is not None and eval_fn is not None
                and step % loop_cfg.eval_every == 0
                and (host_labels := get_host_labels()) is not None):
            preds = np.asarray(eval_fn(state.params, device_batch))
            gts, prs = teacher_forced_texts(
                preds, host_labels, vlm_cfg.num_patches, tokenizer)
            _, a_acc, l1, rel_l1, _, _ = solver.evaluate_batch(gts, prs)
            metrics.commit(solver_action_accuracy=float(np.mean(a_acc)),
                           solver_l1=float(np.mean(l1)),
                           solver_relative_l1=float(np.mean(rel_l1)))
        if ckpt_manager is not None and step % loop_cfg.save_every == 0:
            ckpt_manager.save(state, step=step, epoch=0, loss=final_loss)
        if step >= max_steps:
            break
    if ckpt_manager is not None:
        ckpt_manager.save(state, step=step, epoch=0, loss=final_loss)
        ckpt_manager.wait()
    return state
