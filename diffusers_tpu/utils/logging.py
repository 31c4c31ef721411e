"""Library-root logger with verbosity API and process-zero filtering.

Mirrors the reference's logging surface (`utils/logging.py:131` get_logger,
verbosity setters) adapted for JAX multi-process: the rank-zero filter keys off
``jax.process_index()`` instead of torch.distributed rank.
"""

from __future__ import annotations

import logging
import os
import sys
import threading
from logging import CRITICAL, DEBUG, ERROR, INFO, WARNING  # noqa: F401
from typing import Optional

_lock = threading.Lock()
_default_handler: Optional[logging.Handler] = None

log_levels = {
    "debug": DEBUG,
    "info": INFO,
    "warning": WARNING,
    "error": ERROR,
    "critical": CRITICAL,
}

_default_log_level = WARNING


def _get_default_logging_level() -> int:
    env_level_str = os.getenv("DIFFUSERS_TPU_VERBOSITY", os.getenv("DIFFUSERS_VERBOSITY", None))
    if env_level_str:
        if env_level_str.lower() in log_levels:
            return log_levels[env_level_str.lower()]
        logging.getLogger().warning(
            f"Unknown option DIFFUSERS_VERBOSITY={env_level_str}, has to be one of: {', '.join(log_levels.keys())}"
        )
    return _default_log_level


def _get_library_name() -> str:
    return __name__.split(".")[0]


def _get_library_root_logger() -> logging.Logger:
    return logging.getLogger(_get_library_name())


class _ProcessZeroFilter(logging.Filter):
    """Only emit records on JAX process 0 (multi-host)."""

    def filter(self, record):
        try:
            import jax

            return jax.process_index() == 0
        except Exception:
            return True


def _configure_library_root_logger() -> None:
    global _default_handler
    with _lock:
        if _default_handler:
            return
        _default_handler = logging.StreamHandler(sys.stderr)
        _default_handler.flush = sys.stderr.flush
        library_root_logger = _get_library_root_logger()
        library_root_logger.addHandler(_default_handler)
        library_root_logger.setLevel(_get_default_logging_level())
        library_root_logger.propagate = False


def get_logger(name: Optional[str] = None) -> logging.Logger:
    if name is None:
        name = _get_library_name()
    _configure_library_root_logger()
    return logging.getLogger(name)


def get_verbosity() -> int:
    _configure_library_root_logger()
    return _get_library_root_logger().getEffectiveLevel()


def set_verbosity(verbosity: int) -> None:
    _configure_library_root_logger()
    _get_library_root_logger().setLevel(verbosity)


def set_verbosity_info():
    return set_verbosity(INFO)


def set_verbosity_warning():
    return set_verbosity(WARNING)


def set_verbosity_debug():
    return set_verbosity(DEBUG)


def set_verbosity_error():
    return set_verbosity(ERROR)


def disable_progress_bar() -> None:
    global _tqdm_active
    _tqdm_active = False


def enable_progress_bar() -> None:
    global _tqdm_active
    _tqdm_active = True


_tqdm_active = True


def is_progress_bar_enabled() -> bool:
    return _tqdm_active
