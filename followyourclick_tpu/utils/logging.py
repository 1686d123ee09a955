"""Per-library logging with env-var verbosity.

Behavior spec: reference ``diffusers/utils/logging.py:50-109`` — a library
root logger whose default level comes from an environment variable
(``FYC_VERBOSITY`` here, ``DIFFUSERS_VERBOSITY`` there), ``get_logger``
returning namespaced children, and set/get verbosity helpers. Replaces the
reference first-party code's bare ``print`` calls and its broken
``zero_rank_print`` (animatediff/utils/util.py:14-15, whose condition is
always False — SURVEY.md §5.5).
"""

from __future__ import annotations

import logging
import os
import sys
import threading
from typing import Optional

_lock = threading.Lock()
_handler: Optional[logging.Handler] = None

log_levels = {
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warning": logging.WARNING,
    "error": logging.ERROR,
    "critical": logging.CRITICAL,
}
_default_log_level = logging.WARNING

_LIBRARY = "followyourclick_tpu"


def _get_default_level() -> int:
    env = os.getenv("FYC_VERBOSITY")
    if env:
        if env.lower() in log_levels:
            return log_levels[env.lower()]
        logging.getLogger().warning(
            f"Unknown FYC_VERBOSITY={env}, must be one of "
            f"{', '.join(log_levels)}"
        )
    return _default_log_level


def _configure_root() -> None:
    global _handler
    with _lock:
        if _handler is not None:
            return
        _handler = logging.StreamHandler(sys.stderr)
        _handler.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s %(name)s: %(message)s"))
        root = logging.getLogger(_LIBRARY)
        root.addHandler(_handler)
        root.setLevel(_get_default_level())
        root.propagate = False


def get_logger(name: Optional[str] = None) -> logging.Logger:
    """Namespaced library logger (reference utils/logging.py:109)."""
    _configure_root()
    if name is None:
        name = _LIBRARY
    elif not name.startswith(_LIBRARY):
        name = f"{_LIBRARY}.{name}"
    return logging.getLogger(name)


def get_verbosity() -> int:
    _configure_root()
    return logging.getLogger(_LIBRARY).getEffectiveLevel()


def set_verbosity(level: int) -> None:
    _configure_root()
    logging.getLogger(_LIBRARY).setLevel(level)


def set_verbosity_info() -> None:
    set_verbosity(logging.INFO)


def set_verbosity_warning() -> None:
    set_verbosity(logging.WARNING)


def set_verbosity_debug() -> None:
    set_verbosity(logging.DEBUG)


def set_verbosity_error() -> None:
    set_verbosity(logging.ERROR)


def zero_rank_log(logger: logging.Logger, msg: str) -> None:
    """Log only on process 0 — the reference's ``zero_rank_print`` intent
    (its actual condition is a constant False; implemented correctly here
    per SURVEY.md §7 "quirks to not reproduce")."""
    import jax

    if jax.process_index() == 0:
        logger.info(msg)
