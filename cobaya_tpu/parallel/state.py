"""Multi-process coordination: the reference's MPI layer, reimagined.

Capability parity with /root/reference/cobaya/mpi.py: process identity
helpers, share/gather/allgather/scatter of host values, root-lifting
decorators (``root_only``, ``from_root``, ``set_from_root``,
``sync_errors``), barriers, and an error-propagation state machine so one
process's exception aborts its peers instead of deadlocking them.

TPU-first design: intra-host chain parallelism needs NO communication at all
(walkers are vmapped into the device program); these utilities only matter
for multi-host runs, where they are built on ``jax.distributed`` — array
collectives ride ICI/DCN through one-off jitted psum/all_gather programs, and
out-of-band signaling (the READY/ERROR state machine, which cannot be a
collective because peers poll asynchronously) uses the JAX coordination
service's KV store.  Every function degrades to an exact serial fallback when
only one process exists, so all code runs identically un-distributed —
mirroring the reference's serial fallbacks (mpi.py:138-191).
"""

from __future__ import annotations

import functools
import os
import pickle
import time
from typing import Any, Callable

from ..utils.log import LoggedError, get_logger

log = get_logger("parallel.state")

default_error_timeout_seconds = 5.0


class OtherProcessError(Exception):
    """Another process failed; this one is aborting in sympathy."""


def _distributed_client():
    try:
        from jax._src import distributed

        state = distributed.global_state
        return state.client if state.client is not None else None
    except Exception:
        return None


def process_index() -> int:
    # consult the coordination service first: it exists as soon as
    # jax.distributed.initialize ran, without forcing backend creation
    try:
        from jax._src import distributed

        st = distributed.global_state
        if st.client is not None and st.process_id is not None:
            return int(st.process_id)
    except Exception:
        pass
    return 0


def process_count() -> int:
    try:
        from jax._src import distributed

        st = distributed.global_state
        if st.client is not None and st.num_processes:
            return int(st.num_processes)
    except Exception:
        pass
    return 1


def maybe_init_distributed(no_mpi: bool = False) -> bool:
    """Initialize ``jax.distributed`` from the environment (idempotent).

    The reference auto-detects MPI at import (mpi.py:55); here a
    multi-process run is declared by the launcher via
    ``COBAYA_TPU_COORDINATOR`` / ``COBAYA_TPU_N_PROCESSES`` /
    ``COBAYA_TPU_PROCESS_ID`` (or the standard JAX equivalents, or the TPU
    pod metadata that ``jax.distributed.initialize()`` discovers on its
    own).  Returns True when this run spans more than one process.
    """
    if no_mpi or os.environ.get("COBAYA_TPU_NO_MPI"):
        return False
    if more_than_one_process():
        return True
    addr = os.environ.get("COBAYA_TPU_COORDINATOR") \
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    n = os.environ.get("COBAYA_TPU_N_PROCESSES") \
        or os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("COBAYA_TPU_PROCESS_ID") \
        or os.environ.get("JAX_PROCESS_ID")
    if not (addr and n and pid is not None):
        # TPU pod / managed-cluster launch: jax.distributed.initialize()
        # discovers the topology from the runtime metadata on its own.
        # Only attempt it when a pod marker is present — a bare call on a
        # single workstation raises.
        pod_markers = ("TPU_WORKER_HOSTNAMES", "TPU_WORKER_ID",
                       "MEGASCALE_COORDINATOR_ADDRESS", "CLOUD_TPU_TASK_ID")
        if not any(os.environ.get(v) for v in pod_markers):
            return False
        import jax

        try:
            jax.distributed.initialize()
        except Exception as exc:
            log.warning("TPU pod markers present but jax.distributed "
                        "auto-initialization failed: %s", exc)
            return False
        log.info("Distributed run (pod metadata): process %d of %d",
                 process_index(), process_count())
        return more_than_one_process()
    import jax

    jax.distributed.initialize(
        coordinator_address=addr, num_processes=int(n),
        process_id=int(pid),
    )
    log.info("Distributed run: process %d of %d (coordinator %s)",
             process_index(), process_count(), addr)
    return more_than_one_process()


# reference-compatible aliases
def rank() -> int:
    return process_index()


def size() -> int:
    return process_count()


def is_main_process() -> bool:
    return process_index() == 0


_solo_depth = [0]


def more_than_one_process() -> bool:
    if _solo_depth[0]:
        return False
    return process_count() > 1


class solo:
    """Context: run a code block as if single-process.

    Used by root-gated work (e.g. ``post()``'s root recursion): inside, all
    collectives become serial no-ops, so root does not advance collective
    counters that its peers never see.
    """

    def __enter__(self):
        _solo_depth[0] += 1
        return self

    def __exit__(self, *exc):
        _solo_depth[0] -= 1
        return False


# --------------------------------------------------------------------------
# KV-store object exchange (host values; tiny and infrequent)
# --------------------------------------------------------------------------
_kv_counter = [0]
# keys this process wrote, per counter round — deleted many rounds later so
# a long run doesn't grow the coordination service's store without bound.
# The window must be deep: consecutive root-originated ``share`` calls are
# non-blocking on root, so root's counter can run ahead of a lagging peer
# that has not yet read an old broadcast key.  A peer would have to fall
# _KV_GC_WINDOW collective rounds behind before a key it still needs gets
# deleted; combined with the blocking-read timeout this makes premature GC
# practically unreachable while still bounding the store.
_KV_GC_WINDOW = 64
_kv_written: dict = {}


def _kv_key(tag: str, src: int) -> str:
    return f"cobaya_tpu/{tag}/{_kv_counter[0]}/{src}"


def _kv_set(client, key: str, payload: bytes):
    client.key_value_set_bytes(key, payload)
    _kv_written.setdefault(_kv_counter[0], []).append(key)


def _kv_gc(client):
    cutoff = _kv_counter[0] - _KV_GC_WINDOW
    for round_ in [r for r in _kv_written if r <= cutoff]:
        for key in _kv_written.pop(round_):
            try:
                client.key_value_delete(key)
            except Exception:  # old jax without delete, or already gone
                _kv_written.clear()
                return


def share(value: Any = None, root: int = 0, tag: str = "share",
          timeout_ms: int = 60_000) -> Any:
    """Broadcast a picklable host value from ``root`` (serial: identity).

    ``timeout_ms`` bounds the peers' blocking read; raise it for exchanges
    that follow long unsynchronized per-rank work (rank finish-time skew
    otherwise turns into a spurious timeout failure).
    """
    if not more_than_one_process():
        return value
    client = _distributed_client()
    if client is None:
        raise LoggedError(
            log, "Multi-process run without jax.distributed initialized."
        )
    _kv_counter[0] += 1
    _kv_gc(client)
    key = _kv_key(tag, root)
    if process_index() == root:
        _kv_set(client, key, pickle.dumps(value))
        return value
    raw = client.blocking_key_value_get_bytes(key, timeout_ms)
    return pickle.loads(raw)


share_mpi = share  # reference-compatible name


_tag_seq: dict = {}


def _next_tag(tag: str) -> str:
    """Unique key per logical use of a tag: every rank performs the same
    sequence of calls, so a per-tag local counter stays in lockstep."""
    n = _tag_seq.get(tag, 0)
    _tag_seq[tag] = n + 1
    return f"{tag}/{n}"


def sync_point(tag: str = "sync-point", timeout_ms: int = 600_000) -> None:
    """Counter-free barrier (safe after ranks' collective counters have
    diverged through root-only work).

    Every rank publishes its arrival and blocks until all ranks have.  Use
    before process exit after asymmetric work so the coordination-service
    host doesn't tear down while peers still read.
    """
    if not more_than_one_process():
        return
    client = _distributed_client()
    me = process_index()
    tag = _next_tag("syncpt/" + tag)
    client.key_value_set_bytes(f"cobaya_tpu/{tag}/{me}", b"1")
    for i in range(process_count()):
        if i != me:
            client.blocking_key_value_get_bytes(
                f"cobaya_tpu/{tag}/{i}", timeout_ms
            )


def share_value(value: Any = None, root: int = 0,
                tag: str = "share-value") -> Any:
    """Broadcast under a fixed key (no lockstep counter).

    ``share`` keys embed a per-process collective counter, so every rank
    must execute the same sequence of collectives.  Use this instead when
    ranks may have diverged (e.g. root-only work whose result the peers
    wait for); repeated uses of the same ``tag`` get distinct keys through
    a per-tag sequence counter.
    """
    if not more_than_one_process():
        return value
    client = _distributed_client()
    if client is None:
        raise LoggedError(
            log, "Multi-process run without jax.distributed initialized."
        )
    key = f"cobaya_tpu/once/{_next_tag(tag)}/{root}"
    if process_index() == root:
        client.key_value_set_bytes(key, pickle.dumps(value))
        return value
    raw = client.blocking_key_value_get_bytes(key, 600_000)
    return pickle.loads(raw)


def gather(value: Any, root: int = 0, tag: str = "gather",
           timeout_ms: int = 60_000) -> list | None:
    """Gather host values at ``root`` (serial: [value])."""
    if not more_than_one_process():
        return [value]
    client = _distributed_client()
    _kv_counter[0] += 1
    _kv_gc(client)
    key = _kv_key(tag, process_index())
    _kv_set(client, key, pickle.dumps(value))
    if process_index() != root:
        return None
    out = []
    for src in range(process_count()):
        k = _kv_key(tag, src)
        out.append(pickle.loads(client.blocking_key_value_get_bytes(
            k, timeout_ms)))
    return out


def allgather(value: Any, tag: str = "allgather",
              timeout_ms: int = 60_000) -> list:
    """All processes receive every process's value (serial: [value])."""
    if not more_than_one_process():
        return [value]
    client = _distributed_client()
    _kv_counter[0] += 1
    _kv_gc(client)
    key = _kv_key(tag, process_index())
    _kv_set(client, key, pickle.dumps(value))
    out = []
    for src in range(process_count()):
        k = _kv_key(tag, src)
        out.append(pickle.loads(client.blocking_key_value_get_bytes(
            k, timeout_ms)))
    return out


def zip_gather(list_of_values, root: int = 0, timeout_ms: int = 60_000):
    """Transpose-gather: [a1, b1] + [a2, b2] -> [(a1, a2), (b1, b2)]."""
    gathered = gather(list(list_of_values), root=root, timeout_ms=timeout_ms)
    if gathered is None:
        return None
    return list(zip(*gathered))


def array_gather(list_of_arrays, root: int = 0, timeout_ms: int = 60_000):
    import numpy as np

    gathered = zip_gather(list_of_arrays, root=root, timeout_ms=timeout_ms)
    if gathered is None:
        return None
    return [np.array(g) for g in gathered]


def scatter(values: list | None = None, root: int = 0,
            tag: str = "scatter") -> Any:
    """Root distributes one element to each process (serial: values[0])."""
    if not more_than_one_process():
        return (values or [None])[0]
    client = _distributed_client()
    _kv_counter[0] += 1
    _kv_gc(client)
    if process_index() == root:
        for dst, v in enumerate(values):
            _kv_set(
                client,
                f"cobaya_tpu/{tag}/{_kv_counter[0]}/to{dst}",
                pickle.dumps(v),
            )
    raw = client.blocking_key_value_get_bytes(
        f"cobaya_tpu/{tag}/{_kv_counter[0]}/to{process_index()}", 60_000
    )
    return pickle.loads(raw)


def barrier(tag: str = "barrier"):
    if not more_than_one_process():
        return
    allgather(0, tag=tag)


def abort_if_mpi(code: int = 1):
    """Hard-abort every process (reference mpi.py:198)."""
    if more_than_one_process():
        os._exit(code)


# --------------------------------------------------------------------------
# decorators
# --------------------------------------------------------------------------
def root_only(func: Callable) -> Callable:
    """Run only on the main process (others return None)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        if is_main_process():
            return func(*args, **kwargs)
        return None

    return wrapper


def from_root(func: Callable) -> Callable:
    """Compute on root, broadcast the result to every process."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        result = func(*args, **kwargs) if is_main_process() else None
        return share(result)

    return wrapper


def set_from_root(attrs) -> Callable:
    """Method decorator: compute on root, share the listed attributes."""
    attr_list = [attrs] if isinstance(attrs, str) else list(attrs)

    def decorator(method):
        @functools.wraps(method)
        def wrapper(self, *args, **kwargs):
            result = method(self, *args, **kwargs) if is_main_process() \
                else None
            values = share(
                [getattr(self, a, None) for a in attr_list]
                if is_main_process() else None
            )
            for a, v in zip(attr_list, values):
                setattr(self, a, v)
            return share(result)

        return wrapper

    return decorator


def sync_errors(func: Callable) -> Callable:
    """One process's exception raises OtherProcessError on its peers."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        state = ProcessState(func.__name__)
        with state:
            return func(*args, **kwargs)

    return wrapper


# --------------------------------------------------------------------------
# error/READY state machine (reference mpi.py:350-467)
# --------------------------------------------------------------------------
class State:
    NONE = "none"
    READY = "ready"
    END = "end"
    ERROR = "error"


class ProcessState:
    """Cooperative run-state across processes.

    Each process posts its state under a shared scope in the coordination KV
    store; peers poll cheaply (``check_error``) during long computations.  On
    exception, the state turns ERROR and peers raise
    :class:`OtherProcessError` at their next check or sync point; if peers do
    not end within ``error_timeout``, the process hard-aborts everyone
    (matching the reference's MPI_Abort watchdog, mpi.py:445-461).
    """

    _active: list["ProcessState"] = []
    _counter = [0]

    def __init__(self, name: str = "run",
                 error_timeout: float = default_error_timeout_seconds,
                 timeout_abort_proc: Callable = abort_if_mpi):
        # deterministic name: peers create states in the same order (same
        # program), so a shared counter lines their KV keys up
        ProcessState._counter[0] += 1
        self.name = f"{name}@{ProcessState._counter[0]}"
        self.error_timeout = error_timeout
        self.timeout_abort_proc = timeout_abort_proc
        self._state = State.NONE

    def _key(self, index: int) -> str:
        return f"cobaya_tpu/state/{self.name}/{index}"

    def set(self, state: str):
        self._state = state
        if more_than_one_process():
            client = _distributed_client()
            if client is not None:
                client.key_value_set(self._key(process_index()), state,
                                     allow_overwrite=True)

    def peers_states(self) -> list[str]:
        if not more_than_one_process():
            return []
        client = _distributed_client()
        if client is None:
            return []
        states = []
        for i in range(process_count()):
            if i == process_index():
                continue
            try:
                states.append(client.key_value_try_get(self._key(i)))
            except Exception:
                states.append(State.NONE)
        return states

    def check_error(self):
        """Raise if any peer reported an error (poll during long loops)."""
        if State.ERROR in self.peers_states():
            raise OtherProcessError(
                f"Another process failed during '{self.name}'."
            )

    def all_ready(self) -> bool:
        states = self.peers_states()
        return bool(states) and all(s == State.READY for s in states)

    def wait_all_ended(self) -> bool:
        deadline = time.time() + self.error_timeout
        while time.time() < deadline:
            states = self.peers_states()
            if all(s in (State.END, State.ERROR) for s in states):
                return True
            time.sleep(0.1)
        return False

    def __enter__(self):
        ProcessState._active.append(self)
        self.set(State.NONE)
        return self

    def __exit__(self, exc_type, exc, tb):
        ProcessState._active.pop()
        if exc_type is None:
            self.set(State.END)
            return False
        if issubclass(exc_type, OtherProcessError):
            self.set(State.END)
            return False
        self.set(State.ERROR)
        if more_than_one_process() and not self.wait_all_ended():
            log.critical(
                "Peers did not end within %.1fs after an error; aborting.",
                self.error_timeout,
            )
            self.timeout_abort_proc()
        return False


def get_current_state() -> ProcessState | None:
    return ProcessState._active[-1] if ProcessState._active else None
