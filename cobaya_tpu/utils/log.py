"""Logging infrastructure.

Capability parity with the reference framework's ``log.py``
(/root/reference/cobaya/log.py): a ``LoggedError`` that logs itself when
raised, a ``HasLogger`` mixin giving every component a named logger, global
logger setup with debug control, and a ``NoLogging`` context manager.

Design difference vs the reference: there is no MPI rank decoration here —
multi-chain parallelism in this framework lives *inside* the device program
(vmapped walkers / sharded meshes), so a single host process usually owns all
chains.  When running multi-host via ``jax.distributed``, the process index is
prepended to log records instead of an MPI rank.
"""

from __future__ import annotations

import functools
import logging
import os
import sys
from typing import Any

_DEBUG_ENV = "COBAYA_TPU_DEBUG"

# Exceptions that should never be swallowed and converted into sampler errors.
always_stop_exceptions = (KeyboardInterrupt, SystemExit, MemoryError)


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


class LoggedError(Exception):
    """Exception that logs its message through the given logger when raised.

    Usage: ``raise LoggedError(self.log, "bad option %r", value)``.
    """

    def __init__(self, logger: Any = None, *args: Any, **kwargs: Any):
        if isinstance(logger, str):
            logger = logging.getLogger(logger)
        if logger is None:
            logger = logging.getLogger("cobaya_tpu")
        msg = ""
        if args:
            msg = str(args[0])
            rest = args[1:]
            if rest:
                try:
                    msg = msg % rest
                except TypeError:
                    msg = " ".join([msg] + [str(a) for a in rest])
        if msg:
            logger.error(msg)
        super().__init__(msg)


class InputError(LoggedError):
    """Error in the user's input specification."""


class NoLogging:
    """Context manager that temporarily silences logging below ``level``."""

    def __init__(self, level: int = logging.ERROR):
        self.level = level

    def __enter__(self):
        self._previous = logging.root.manager.disable
        logging.disable(self.level)

    def __exit__(self, *exc):
        logging.disable(self._previous)


def is_debug() -> bool:
    return logging.root.getEffectiveLevel() <= logging.DEBUG or bool(
        os.environ.get(_DEBUG_ENV)
    )


def logger_setup(debug: bool | int | None = None) -> None:
    """Configure the root logger.

    ``debug`` may be True/False, an integer logging level, or None (keep
    current / read env var).
    """
    if debug is None:
        debug = bool(os.environ.get(_DEBUG_ENV))
    if debug is True:
        level = logging.DEBUG
    elif debug is False or debug is None:
        level = logging.INFO
    else:
        level = int(debug)
    fmt = "[%(name)s] %(levelname)s: %(message)s"
    if _process_index() != 0 or os.environ.get("JAX_PROCESS_COUNT", "1") != "1":
        fmt = f"[proc {_process_index()}] " + fmt
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(logging.Formatter(fmt))
    root = logging.getLogger()
    # Replace our previous handler rather than stacking duplicates.
    for h in list(root.handlers):
        if getattr(h, "_cobaya_tpu", False):
            root.removeHandler(h)
    handler._cobaya_tpu = True  # type: ignore[attr-defined]
    root.addHandler(handler)
    root.setLevel(level)


class HasLogger:
    """Mixin: gives the instance a ``self.log`` named logger."""

    def set_logger(self, name: str | None = None) -> None:
        self.log = logging.getLogger(name or self.__class__.__name__)

    @property
    def logger(self) -> logging.Logger:
        if not hasattr(self, "log"):
            self.set_logger()
        return self.log

    def mpi_info(self, msg, *args):  # name kept for API familiarity
        if _process_index() == 0:
            self.logger.info(msg, *args)

    def mpi_warning(self, msg, *args):
        if _process_index() == 0:
            self.logger.warning(msg, *args)

    def mpi_debug(self, msg, *args):
        if _process_index() == 0:
            self.logger.debug(msg, *args)

    def is_debug(self) -> bool:
        return self.logger.getEffectiveLevel() <= logging.DEBUG

    def is_debug_and_mpi_root(self) -> bool:
        return self.is_debug() and _process_index() == 0


def abstract(method):
    """Decorator marking a method that subclasses must override."""

    @functools.wraps(method)
    def not_implemented(self, *args, **kwargs):
        raise LoggedError(
            getattr(self, "log", None),
            "%s must implement %s()",
            self.__class__.__name__,
            method.__name__,
        )

    not_implemented._is_abstract = True
    return not_implemented


def get_logger(name: str) -> logging.Logger:
    return logging.getLogger(name)
