"""Orbax train-state checkpointing with resume.

Improves on the reference checkpoint story (SURVEY §5): the torch FSDP path
saves rank-0 full state dicts and does NOT restore optimizer state on resume
(``/root/reference/prismatic/training/strategies/fsdp.py:95-136``,
``vla-scripts/train.py:153-160``); here the FULL sharded train state
(params + optimizer + step) is saved asynchronously and restored with the
original shardings, plus the same JSON sidecars (``config.json``,
``dataset_statistics.json``) required at inference.

Checkpoint naming mirrors the reference pattern
``step-{:06d}-epoch-{:02d}-loss={:.4f}`` (``fsdp.py:115``).
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Optional, Tuple

from emmax_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)

# loss may legitimately print as nan/inf (diverged run hitting a save
# boundary) — the name must still list/parse/GC
_CKPT_RE = re.compile(r"step-(\d+)-epoch-(\d+)-loss=([0-9.]+|nan|inf)$")


class CheckpointManager:
    def __init__(self, run_dir, max_to_keep: Optional[int] = None,
                 async_save: bool = True) -> None:
        import orbax.checkpoint as ocp

        self.run_dir = Path(run_dir).absolute()
        self.ckpt_dir = self.run_dir / "checkpoints"
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self._ocp = ocp
        self._ckptr = (ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
                       if async_save else ocp.StandardCheckpointer())
        self.max_to_keep = max_to_keep

    # -- save -----------------------------------------------------------------
    def save(self, state: Any, *, step: int, epoch: int, loss: float) -> Path:
        name = f"step-{step:06d}-epoch-{epoch:02d}-loss={loss:.4f}"
        path = self.ckpt_dir / name
        if path.exists():
            # a periodic save and a max_steps/epoch-end save can land on the
            # same step (same name) — Orbax raises on an existing directory,
            # which crashed training at the finish line; idempotent skip
            overwatch.info(f"checkpoint {name} already exists; skipping")
            return path
        if isinstance(self._ckptr, self._ocp.StandardCheckpointer):
            self._ckptr.save(path, state)
        else:
            self._ckptr.save(path, args=self._ocp.args.StandardSave(state))
        overwatch.info(f"saved checkpoint {name}")
        self._gc()
        return path

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def _gc(self) -> None:
        if self.max_to_keep is None:
            return
        ckpts = self.list_checkpoints()
        for path, _ in ckpts[:-self.max_to_keep]:
            import shutil

            shutil.rmtree(path, ignore_errors=True)

    # -- restore --------------------------------------------------------------
    def list_checkpoints(self):
        out = []
        for p in self.ckpt_dir.iterdir() if self.ckpt_dir.is_dir() else []:
            m = _CKPT_RE.match(p.name)
            if m and p.is_dir():
                out.append((p, int(m.group(1))))
        return sorted(out, key=lambda t: t[1])

    def latest(self) -> Optional[Path]:
        ckpts = self.list_checkpoints()
        return ckpts[-1][0] if ckpts else None

    def restore(self, template: Any, path: Optional[Path] = None) -> Any:
        path = path or self.latest()
        if path is None:
            raise FileNotFoundError(f"no checkpoints under {self.ckpt_dir}")
        if isinstance(self._ckptr, self._ocp.StandardCheckpointer):
            restored = self._ckptr.restore(Path(path).absolute(), template)
        else:
            restored = self._ckptr.restore(
                Path(path).absolute(),
                args=self._ocp.args.StandardRestore(template))
        overwatch.info(f"restored checkpoint {Path(path).name}")
        return restored

    @staticmethod
    def parse_name(path) -> Tuple[int, int, float]:
        m = _CKPT_RE.match(Path(path).name)
        if not m:
            raise ValueError(f"not a checkpoint dir name: {path}")
        return int(m.group(1)), int(m.group(2)), float(m.group(3))


def write_sidecars(run_dir, config_blob: dict,
                   dataset_statistics: Optional[dict] = None) -> None:
    """config.json (+ .yaml-ish) and dataset_statistics.json next to the
    checkpoints (reference ``train.py:140-144,214-216``)."""
    run_dir = Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    with open(run_dir / "config.json", "w") as f:
        json.dump(config_blob, f, indent=2, default=str)
    if dataset_statistics is not None:
        with open(run_dir / "dataset_statistics.json", "w") as f:
            json.dump(dataset_statistics, f, indent=2, default=float)
