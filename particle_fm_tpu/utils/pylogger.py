"""Rank-zero-aware logging.

Parity: particle_fm/utils/pylogger.py:6 — log methods are no-ops on every
process except process 0, so multi-host SPMD runs don't emit N copies of
every line. The JAX-native "rank" is jax.process_index().
"""

from __future__ import annotations

import logging


def _is_rank_zero() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


class _RankZeroFilter(logging.Filter):
    def filter(self, record):  # noqa: A003
        return _is_rank_zero()


def get_pylogger(name: str = __name__) -> logging.Logger:
    """Logger whose records are dropped on non-zero processes."""
    logger = logging.getLogger(name)
    if not any(isinstance(f, _RankZeroFilter) for f in logger.filters):
        logger.addFilter(_RankZeroFilter())
    if not logger.handlers and not logging.getLogger().handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter("[%(name)s] %(message)s"))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
    return logger
