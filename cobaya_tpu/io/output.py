"""File output driver: run products on disk, locking, resume.

Capability parity with /root/reference/cobaya/output.py: prefix/folder
resolution, ``<prefix>.input.yaml`` and ``<prefix>.updated.yaml`` dumps with
resume-compatibility checking, chain-file naming/discovery, an exclusive lock
against concurrent same-prefix runs, forced-output deletion, and
``load_samples``.

Design difference: locking uses O_CREAT|O_EXCL lock files (no portalocker
dependency); multi-process semantics follow jax.distributed process_index
(only process 0 touches shared files) instead of MPI root.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Optional

import numpy as np

from ..utils import conventions as cv
from ..utils.log import HasLogger, LoggedError
from ..utils.tools import deepcopy_where_possible
from ..utils.yamlio import yaml_dump, yaml_load_file
from .collection import SampleCollection


class FileLock(HasLogger):
    """Exclusive lock on an output prefix (reference output.py:54)."""

    def __init__(self, file_base: str, logger=None):
        self.lock_file = file_base + cv.Extension.locked
        self.set_logger("output.lock")
        self._fd = None

    def acquire(self, force: bool = False):
        if os.path.exists(self.lock_file) and (force or self._holder_dead()):
            os.remove(self.lock_file)
        try:
            self._fd = os.open(
                self.lock_file, os.O_CREAT | os.O_EXCL | os.O_WRONLY
            )
            os.write(self._fd, str(os.getpid()).encode())
        except FileExistsError as exc:
            raise LoggedError(
                self.log,
                "Output prefix is locked by another live run (%s). Starting "
                "a second run on the same prefix would corrupt its products; "
                "if the other process is unrelated, use a different output "
                "prefix, or delete the lock file if you are sure it is "
                "stale.", self.lock_file,
            ) from exc

    def _holder_dead(self) -> bool:
        """Whether the lock-holding process no longer exists (stale lock)."""
        try:
            with open(self.lock_file, encoding="utf-8") as f:
                pid = int(f.read().strip() or 0)
        except (OSError, ValueError):
            return True
        if pid <= 0:
            return True
        try:
            os.kill(pid, 0)
            return False
        except ProcessLookupError:
            return True
        except PermissionError:
            return False

    def release(self):
        if os is None:  # interpreter teardown already cleared the module
            return
        if self._fd is not None:
            os.close(self._fd)
            self._fd = None
        if os.path.exists(self.lock_file):
            try:
                os.remove(self.lock_file)
            except OSError:
                pass

    def __del__(self):
        try:
            self.release()
        except Exception:
            pass


class OutputReadOnly(HasLogger):
    """Read-only view of a run's output prefix."""

    def __init__(self, prefix: str, infix: Optional[str] = None):
        self.set_logger("output")
        folder, base = os.path.split(prefix)
        self.folder = folder or "."
        self.prefix = base.rstrip("._") if base else ""
        self.infix = (infix.strip(".") + ".") if infix else ""

    def add_suffix(self, suffix: str, separator: str = ".") -> str:
        base = os.path.join(self.folder, self.prefix) if self.prefix else (
            self.folder + os.sep
        )
        return base + (separator if self.prefix else "") + self.infix + suffix

    @property
    def file_input(self) -> str:
        return self.add_suffix("input.yaml", separator=".")

    @property
    def file_updated(self) -> str:
        return self.add_suffix("updated.yaml", separator=".")

    def prefix_regexp_name(self, name: str, extension: str = "txt") -> str:
        sep = "." if self.prefix else ""
        return os.path.join(
            self.folder, f"{self.prefix}{sep}{self.infix}{name}.{extension}"
        )

    def collection_regexp(self, extension: str = "txt") -> re.Pattern:
        sep = re.escape(".") if self.prefix else ""
        return re.compile(
            re.escape(self.prefix) + sep + re.escape(self.infix)
            + r"(\d+)\." + extension + "$"
        )

    def find_collections(self, extension: str = "txt") -> list[str]:
        rx = self.collection_regexp(extension)
        out = []
        for f in sorted(os.listdir(self.folder or ".")):
            if rx.match(f):
                out.append(os.path.join(self.folder, f))
        return out

    def get_updated_info(self, use_cache: bool = False) -> Optional[dict]:
        if os.path.exists(self.file_updated):
            return yaml_load_file(self.file_updated)
        return None

    def reload_updated_info(self, cache=False):
        return self.get_updated_info()

    def is_resuming(self):
        return False


class Output(OutputReadOnly):
    """Writable output driver."""

    def __init__(self, prefix: str, resume: bool = False, force: bool = False,
                 infix: Optional[str] = None):
        super().__init__(prefix, infix=infix)
        self.force = force
        self._resuming = False
        if self.folder and not os.path.exists(self.folder):
            os.makedirs(self.folder, exist_ok=True)
        self.lock = FileLock(self.add_suffix("", separator="."))
        self.lock.acquire()  # stale (dead-PID) locks are taken over
        existing = os.path.exists(self.file_updated)
        if existing:
            if force:
                self.delete_infix_products()
            elif resume:
                self._resuming = True
            else:
                raise LoggedError(
                    self.log,
                    "Output prefix '%s' already has products. Use resume=True "
                    "to continue or force=True to overwrite.",
                    os.path.join(self.folder, self.prefix),
                )
        self.log.info(
            "Output to be read-from/written-into folder '%s', with prefix "
            "'%s'", self.folder, self.prefix,
        )

    def is_resuming(self) -> bool:
        return self._resuming

    def set_resuming(self, value: bool):
        self._resuming = value

    def delete_infix_products(self):
        base = os.path.join(self.folder, self.prefix)
        sep = "." if self.prefix else ""
        for pattern in (
            f"{base}{sep}{self.infix}*.txt",
            f"{base}{sep}{self.infix}*.yaml",
            f"{base}{sep}*{cv.Extension.checkpoint}",
            f"{base}{sep}*{cv.Extension.progress}",
            f"{base}{sep}*{cv.Extension.covmat}",
            f"{base}{sep}*{cv.Extension.evidence}",
            f"{base}{sep}*.state.npz",
        ):
            for f in glob.glob(pattern):
                os.remove(f)

    def check_and_dump_info(self, input_info, updated_info,
                            check_compatible: bool = True,
                            cache_old: bool = False,
                            ignore_blocks=()):
        """Dump input/updated infos; check resume compatibility if resuming."""
        from ..models.input_ import is_equal_info

        if self._resuming and check_compatible:
            old = self.get_updated_info()
            if old is not None:
                new_cmp = _strip_uncomparable(updated_info, ignore_blocks)
                old_cmp = _strip_uncomparable(old, ignore_blocks)
                if not is_equal_info(old_cmp, new_cmp):
                    raise LoggedError(
                        self.log,
                        "The input info of the resumed run is not compatible "
                        "with the existing products. Delete them or use "
                        "force=True.",
                    )
        if input_info is not None:
            with open(self.file_input, "w", encoding="utf-8") as f:
                f.write(yaml_dump(_dumpable(input_info)))
        if updated_info is not None:
            with open(self.file_updated, "w", encoding="utf-8") as f:
                f.write(yaml_dump(_dumpable(updated_info)))

    def create_folder(self, folder: str):
        os.makedirs(folder, exist_ok=True)

    def close(self):
        self.lock.release()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class OutputDummy(OutputReadOnly):
    """No-op output (when no output prefix was requested)."""

    def __init__(self, *args, **kwargs):
        self.set_logger("output.dummy")
        self.folder = "."
        self.prefix = ""
        self.infix = ""
        self.force = False

        def _noop(*a, **k):
            return None

        for method in (
            "check_and_dump_info", "delete_infix_products", "create_folder",
            "close", "set_resuming",
        ):
            setattr(self, method, _noop)

    def prefix_regexp_name(self, name, extension="txt"):
        return None

    def is_resuming(self):
        return False

    def __bool__(self):
        return False


class OutputNonRoot(OutputReadOnly):
    """Per-rank output view in a multi-process run.

    The root process owns all shared products (info yaml dumps, the run
    lock, deletions, compatibility checks — reference output.py:432); other
    ranks keep path arithmetic (so they can write their own chain/state
    files under rank-specific names) but no-op every shared side effect.
    """

    def __init__(self, prefix: str, resuming: bool,
                 infix: Optional[str] = None):
        super().__init__(prefix, infix=infix)
        self.force = False
        self._resuming = bool(resuming)

    def is_resuming(self) -> bool:
        return self._resuming

    def set_resuming(self, value: bool):
        self._resuming = bool(value)

    def check_and_dump_info(self, *args, **kwargs):
        return None

    def delete_infix_products(self):
        return None

    def create_folder(self, folder: str):
        os.makedirs(folder, exist_ok=True)

    def close(self):
        return None


def get_output(prefix: Optional[str] = None, resume: bool = False,
               force: bool = False, infix: Optional[str] = None):
    from ..parallel import state as pstate

    if prefix:
        if pstate.is_main_process():
            out = Output(prefix, resume=resume, force=force, infix=infix)
            pstate.share(out.is_resuming(), tag="output-resuming")
            return out
        resuming = pstate.share(None, tag="output-resuming")
        return OutputNonRoot(prefix, resuming, infix=infix)
    return OutputDummy()


def _strip_uncomparable(info, ignore_blocks=()):
    info = deepcopy_where_possible(dict(info or {}))
    for k in ("output", "debug", "resume", "force", "test", "version",
              "packages_path", *ignore_blocks):
        info.pop(k, None)
    return info


def _dumpable(info):
    info = deepcopy_where_possible(dict(info or {}))
    info.pop("resume", None)
    info.pop("force", None)
    return info


def load_samples(prefix: str, to_getdist: bool = False,
                 skip: float = 0, thin: int = 1,
                 combined: bool = False):
    """Load all chains of a run prefix (reference output.py:807)."""
    out = OutputReadOnly(prefix)
    files = out.find_collections()
    if not files:
        raise LoggedError(
            None, "No chain files found for prefix '%s'", prefix
        )
    # the run's sampling temperature is recorded in the updated info; a
    # tempered chain's weights/logpost only make sense with it (reference
    # output.py:850 reads it the same way)
    temperature = 1.0
    info = out.get_updated_info()
    for sampler_block in (info or {}).get("sampler", {}).values():
        temperature = float((sampler_block or {}).get("temperature") or 1.0)
    collections = [
        SampleCollection.load(f, name=str(i + 1), temperature=temperature)
        for i, f in enumerate(files)
    ]
    if skip:
        collections = [c.skip_samples(skip) for c in collections]
    if thin != 1:
        collections = [c.thin_samples(thin) for c in collections]
    if to_getdist:
        combined_c = _combine(collections)
        return combined_c.to_getdist()
    if combined:
        return _combine(collections)
    return collections


def _combine(collections):
    base = collections[0]._empty_like()
    for c in collections:
        base.append_rows(c.data)
    return base
