"""Metrics containers and trackers.

Counterpart of ``/root/reference/prismatic/training/metrics.py:25-521``:
``Tracker`` protocol, ``JSONLinesTracker`` (``run-metrics.jsonl`` +
``{run_id}.jsonl``), an optional wandb tracker (gated — wandb isn't in this
image), and the three metric containers with deque smoothing. The Emma-X
container is ``VLADiscreteMetrics`` (status line: loss / state acc / action
acc / L1 / lr / step time, ``metrics.py:355-521``).
"""

from __future__ import annotations

import json
import time
from collections import deque
from pathlib import Path
from typing import Any, Dict, List, Optional, Protocol

import numpy as np

from emmax_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)


class Tracker(Protocol):
    def write_hyperparameters(self, hparams: Dict) -> None: ...

    def write(self, global_step: int, metrics: Dict[str, Any]) -> None: ...

    def finalize(self) -> None: ...


class JSONLinesTracker:
    def __init__(self, run_id: str, run_dir, hparams: Optional[Dict] = None
                 ) -> None:
        self.run_id, self.run_dir = run_id, Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.hparams = hparams or {}

    def write_hyperparameters(self, hparams: Optional[Dict] = None) -> None:
        with open(self.run_dir / "run-metrics.jsonl", "a") as f:
            f.write(json.dumps({"run_id": self.run_id,
                                "hparams": hparams or self.hparams},
                               default=str) + "\n")

    def write(self, global_step: int, metrics: Dict[str, Any]) -> None:
        with open(self.run_dir / f"{self.run_id}.jsonl", "a") as f:
            f.write(json.dumps({"step": global_step, **metrics},
                               default=float) + "\n")

    def finalize(self) -> None:
        pass


class WeightsBiasesTracker:
    """Thin wandb adapter; no-ops when wandb is unavailable."""

    def __init__(self, run_id: str, run_dir, hparams: Optional[Dict] = None,
                 project: str = "emmax-tpu", entity: Optional[str] = None
                 ) -> None:
        try:
            import wandb  # noqa: F401

            self._wandb = wandb
            self._run = wandb.init(project=project, entity=entity,
                                   name=run_id, dir=str(run_dir),
                                   config=hparams)
        except Exception:
            self._wandb, self._run = None, None
            overwatch.warning("wandb unavailable — WeightsBiasesTracker is a no-op")

    def write_hyperparameters(self, hparams: Optional[Dict] = None) -> None:
        if self._run is not None and hparams:
            self._run.config.update(hparams, allow_val_change=True)

    def write(self, global_step: int, metrics: Dict[str, Any]) -> None:
        if self._run is not None:
            self._wandb.log(metrics, step=global_step)

    def finalize(self) -> None:
        if self._run is not None:
            self._run.finish()


def build_trackers(kinds, run_id: str, run_dir, hparams=None) -> List[Tracker]:
    out: List[Tracker] = []
    for kind in kinds:
        if kind == "jsonl":
            out.append(JSONLinesTracker(run_id, run_dir, hparams))
        elif kind == "wandb":
            out.append(WeightsBiasesTracker(run_id, run_dir, hparams))
        else:
            raise ValueError(f"unknown tracker {kind!r}")
    return out


class _SmoothedMetrics:
    """Deque-smoothed metric aggregation + wall-clock step timing."""

    def __init__(self, trackers: List[Tracker], window: int = 128) -> None:
        self.trackers = trackers
        self.window = window
        self.deques: Dict[str, deque] = {}
        self.global_step = 0
        self._t_last = time.time()
        self.step_times: deque = deque(maxlen=window)

    def commit(self, **values: float) -> None:
        for k, v in values.items():
            self.deques.setdefault(k, deque(maxlen=self.window)).append(
                float(v))

    def _means(self) -> Dict[str, float]:
        return {k: float(np.mean(d)) for k, d in self.deques.items() if d}

    def push(self, lr: float, extra: Optional[Dict] = None) -> Dict[str, float]:
        now = time.time()
        self.step_times.append(now - self._t_last)
        self._t_last = now
        out = self._means()
        out["lr"] = lr
        out["step_time_s"] = float(np.mean(self.step_times))
        if extra:
            out.update(extra)
        for t in self.trackers:
            t.write(self.global_step, out)
        self.global_step += 1
        return out

    def finalize(self) -> None:
        for t in self.trackers:
            t.finalize()

    def status(self, epoch: int, lr: float) -> str:
        m = self._means()
        return (f"epoch {epoch:03d} step {self.global_step:06d} | "
                f"loss={m.get('loss', float('nan')):.4f} lr={lr:.2e}")


class Metrics(_SmoothedMetrics):
    """VLM pretraining metrics (loss / lr / step time)."""


class VLAMetrics(_SmoothedMetrics):
    """RLDS VLA metrics with per-dataset splits (``metrics.py:310``)."""

    def commit_for_dataset(self, dataset_name: str, **values: float) -> None:
        self.commit(**{f"{dataset_name}/{k}": v for k, v in values.items()})


class VLADiscreteMetrics(_SmoothedMetrics):
    """Emma-X GCOT training metrics: loss, action-token accuracy, L1,
    relative L1, state accuracy, solver-eval scores."""

    def status(self, epoch: int, lr: float) -> str:
        m = self._means()
        return (f"epoch {epoch:03d} step {self.global_step:06d} | "
                f"loss={m.get('loss', float('nan')):.4f} "
                f"act_acc={m.get('action_accuracy', float('nan')):.3f} "
                f"act_l1={m.get('action_l1', float('nan')):.4f} "
                f"lr={lr:.2e}")
