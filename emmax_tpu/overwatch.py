"""Rank-aware logging ("overwatch").

TPU-native counterpart of ``/root/reference/prismatic/overwatch/overwatch.py``:
instead of wrapping ``accelerate.PartialState`` (torch.distributed), rank and
world size come from the JAX runtime (``jax.process_index`` /
``jax.process_count``) when it is initialized, and fall back to a pure
single-process view otherwise. Provides the same surface: module-level
``initialize_overwatch``, ``.rank()`` / ``.world_size()`` /
``.is_rank_zero()``, and ``rank_zero_only`` decorators.
"""

from __future__ import annotations

import functools
import logging
import os
import sys
from typing import Any, Callable, Optional, TypeVar

_T = TypeVar("_T")

LOG_FORMAT = "%(asctime)s | %(levelname)-7s | %(name)s :: %(message)s"
DATEFMT = "%m/%d %H:%M:%S"


def _jax_rank_world() -> tuple:
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


class Overwatch:
    """Logger facade; rank/world resolved lazily so importing this module
    never forces JAX backend initialization."""

    def __init__(self, name: str) -> None:
        self.logger = logging.getLogger(name)
        if not logging.getLogger().handlers and not self.logger.handlers:
            handler = logging.StreamHandler(sys.stdout)
            handler.setFormatter(logging.Formatter(LOG_FORMAT, datefmt=DATEFMT))
            self.logger.addHandler(handler)
            self.logger.propagate = False
        level = os.environ.get("EMMAX_LOG_LEVEL", "INFO").upper()
        self.logger.setLevel(level)

    # -- distributed context ---------------------------------------------------
    def rank(self) -> int:
        return _jax_rank_world()[0]

    def world_size(self) -> int:
        return _jax_rank_world()[1]

    def is_rank_zero(self) -> bool:
        return self.rank() == 0

    def rank_zero_only(self, fn: Callable[..., _T]) -> Callable[..., Optional[_T]]:
        @functools.wraps(fn)
        def wrapper(*args: Any, **kwargs: Any) -> Optional[_T]:
            if self.is_rank_zero():
                return fn(*args, **kwargs)
            return None

        return wrapper

    # -- logging (rank-0 by default, like the reference's @rank0 methods) ------
    def _fmt(self, msg: str, ctx_level: int = 0) -> str:
        return f"{'  ' * ctx_level}{'=>> ' if ctx_level else ''}{msg}"

    def debug(self, msg: str, ctx_level: int = 0, all_ranks: bool = False) -> None:
        if all_ranks or self.is_rank_zero():
            self.logger.debug(self._fmt(msg, ctx_level))

    def info(self, msg: str, ctx_level: int = 0, all_ranks: bool = False) -> None:
        if all_ranks or self.is_rank_zero():
            self.logger.info(self._fmt(msg, ctx_level))

    def warning(self, msg: str, ctx_level: int = 0, all_ranks: bool = False) -> None:
        if all_ranks or self.is_rank_zero():
            self.logger.warning(self._fmt(msg, ctx_level))

    def error(self, msg: str, ctx_level: int = 0) -> None:
        self.logger.error(self._fmt(msg, ctx_level), )


def initialize_overwatch(name: str) -> Overwatch:
    return Overwatch(name)
