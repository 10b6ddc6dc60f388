"""Adaptive blocked Metropolis MCMC over thousands of vmapped walkers.

Capability parity with /root/reference/cobaya/samplers/mcmc/mcmc.py (the
CosmoMC-style sampler of Lewis arXiv:1304.4473): blocked random-direction
proposals in the Cholesky-rotated space with fast/slow oversampling, on-the-fly
proposal-covariance learning gated by Gelman-Rubin R-1, dual convergence
criteria (R-1 of means + R-1 of confidence-level bounds), tempered sampling,
periodic-parameter wrapping, burn-in, stuck-chain detection, checkpointing
with exact resume, and a ``.progress`` table.

TPU-first architecture: instead of one chain per MPI rank exchanging
covariances at learn points, a single host drives ``n_chains`` independent
walkers as one batched device program.  Each *epoch* (``learn_every`` steps)
is a single jitted two-level ``lax.scan``; per-walker running moments are
accumulated on device and fetched once per epoch, so the host sees O(C d^2)
bytes per epoch regardless of step count.  Cross-walker statistics replace
cross-rank MPI allgathers; the R-1 diagnostic treats every walker as a chain.
Proposal arrays (covariance transforms, block schedule) are scan inputs, so
learning a new proposal never recompiles.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Optional, Union

import numpy as np

from ...io.collection import SampleCollection
from ...ops import moments as mom_ops
from ...ops.convergence import (
    rminus1_cl_bounds,
    rminus1_from_covs,
    rminus1_of_moments,
)
from ...ops.metropolis import MCMCCarry, init_carry, make_epoch_fn, reset_moments
from ...ops.proposal import (
    build_blocked_proposal,
    make_block_schedule,
    regularize_learned_covmat,
)
from ...utils import conventions as cv
from ...utils.log import LoggedError
from ...utils.tools import NumberWithUnits, read_dnumber
from ..sampler import CovmatSampler


def _pool_window_stats(per_proc: list) -> tuple:
    """Pool one window's statistics over processes.

    Each entry is ``[rminus1, mean_of_covs, cov_of_means, mu, weight]``
    from one process; the pooled covariance-of-means adds the between-
    process spread of the mean vectors (exact for count-weighted walker
    means), and R-1 is recomputed from the pooled matrices.
    """
    ws = np.array([float(p[4]) for p in per_proc])
    wsum = max(ws.sum(), 1e-30)
    w = ws / wsum
    moc = sum(wi * np.asarray(p[1]) for wi, p in zip(w, per_proc))
    mus = np.stack([np.asarray(p[3]) for p in per_proc])
    M = np.einsum("p,pi->i", w, mus)
    com = sum(
        wi * (np.asarray(p[2]) + np.outer(mu - M, mu - M))
        for wi, p, mu in zip(w, per_proc, mus)
    )
    try:
        r = rminus1_from_covs(moc, com)
    except np.linalg.LinAlgError:
        r = np.inf
    return (r, moc, com, M, wsum)


class MCMC(CovmatSampler):
    """Adaptive blocked Metropolis sampler (many-walker, jit-compiled)."""

    file_base_name = "mcmc"

    # typed option declarations (values from mcmc.yaml)
    burn_in: Union[int, str]
    max_tries: Union[int, str]
    proposal_scale: float
    proposal_directions: str
    output_every: Union[int, str]
    learn_every: Union[int, str]
    temperature: float
    learn_proposal: bool
    learn_proposal_Rminus1_max: float
    learn_proposal_Rminus1_max_early: float
    learn_proposal_Rminus1_min: float
    max_samples: float
    max_wall: Optional[float]
    Rminus1_stop: float
    Rminus1_cl_stop: float
    Rminus1_cl_level: float
    Rminus1_n_checks: int
    Rminus1_single_split: int
    Rminus1_n_groups: int
    measure_speeds: bool
    oversample_power: float
    oversample_thin: bool
    drag: bool
    blocking: Optional[list]
    callback_function: Optional[Callable]
    callback_every: Optional[int]
    n_chains: int
    records_per_epoch: int
    cl_bounds_records: int
    output_format: str
    output_chains: int
    fetch_chains: Optional[int]
    pipeline_epochs: bool
    precision: str
    ensemble_remix: bool
    remix_every: int
    remix_inflate: float
    max_steps_per_dispatch: Optional[Union[int, str]]
    # deprecated reference options (accepted with a warning)
    check_every: Optional[Union[int, str]]
    oversample: Optional[Any]
    drag_limits: Optional[Any]

    supports_periodic_params = True

    _at_resume_prefer_new = [
        "max_samples", "max_wall", "max_tries", "output_every", "learn_every",
        "callback_function", "callback_every", "Rminus1_stop",
        "Rminus1_cl_stop", "Rminus1_cl_level", "learn_proposal",
        "ensemble_remix", "remix_every", "remix_inflate",
        "Rminus1_n_groups", "max_steps_per_dispatch",
    ]
    _at_resume_prefer_old = ["proposal_scale", "blocking", "covmat",
                             "temperature", "n_chains"]

    def initialize(self):
        import jax
        import jax.numpy as jnp

        # setup-phase timing (env-gated): the tunnel-TPU backend makes
        # eager dispatches and compiles expensive; this pinpoints them
        import os as _os

        _t0 = time.time()
        _timing = bool(_os.environ.get("COBAYA_TPU_SETUP_TIMING"))

        def _tlog(phase):
            if _timing:
                self.mpi_info("[setup] %-18s +%.1fs", phase,
                              time.time() - _t0)

        self._setup_tlog = _tlog
        model = self.model
        self.d = len(model.parameterization.sampled_params())
        if self.d == 0:
            raise LoggedError(self.log, "No sampled parameters!")
        # deprecated reference options, accepted for input compatibility
        # (reference mcmc.yaml:76-80)
        if getattr(self, "check_every", None) is not None:
            self.mpi_warning(
                "Option 'check_every' is deprecated: using it as "
                "'learn_every'.")
            self.learn_every = self.check_every
        for dep in ("oversample", "drag_limits"):
            if getattr(self, dep, None) is not None:
                self.mpi_warning(
                    "Option '%s' is deprecated and ignored: use "
                    "'oversample_power' instead.", dep)
        self._dtype = jnp.dtype(self.precision)
        # device mesh: shard walkers across all visible devices
        n_dev = len(jax.devices())
        self._mesh = None
        if n_dev > 1:
            from ...parallel.mesh import make_mesh, round_up_chains

            new_C = round_up_chains(self.n_chains, n_dev)
            if new_C != self.n_chains:
                self.mpi_info(
                    "Rounding n_chains %d -> %d (multiple of %d devices)",
                    self.n_chains, new_C, n_dev,
                )
                self.n_chains = new_C
            self._mesh = make_mesh()
        # resolve d-unit options
        self._burn_in = read_dnumber(self.burn_in, self.d)
        self._max_tries = read_dnumber(self.max_tries, self.d)
        self._learn_every = max(read_dnumber(self.learn_every, self.d), 2)
        self._output_every = NumberWithUnits(self.output_every, "s", dtype=float)
        if self.temperature is None:
            self.temperature = 1
        # --- speeds & blocking ---------------------------------------------------
        needs_speeds = any(
            not getattr(c, "jittable", False) for c in model.components
        )
        if self.measure_speeds and needs_speeds:
            model.measure_and_set_speeds(random_state=self.rng)
        self._setup_tlog("speeds+blocking")
        if self.blocking:
            blocks, oversampling = model.check_blocking(self.blocking)
        else:
            blocks, oversampling = model.get_param_blocking_for_sampler(
                oversample_power=self.oversample_power,
                split_fast_slow=self.drag,
            )
        self._blocks = blocks
        self._oversampling = np.asarray(oversampling, dtype=int)
        sampled = list(model.parameterization.sampled_params())
        self._block_indices = [
            [sampled.index(p) for p in block] for block in blocks
        ]
        # oversample_thin: records are spaced at least the average
        # per-parameter oversampling apart, so oversampled fast moves do
        # not balloon the stored output (reference mcmc.py:377-389)
        self._output_thin = 1
        if self.oversample_thin and np.max(self._oversampling) > 1:
            self._output_thin = max(1, int(np.round(
                sum(len(b) * o for b, o in
                    zip(blocks, self._oversampling)) / self.d
            )))
        if self.output_format not in ("thinned", "accepted"):
            raise LoggedError(
                self.log, "output_format must be 'thinned' or 'accepted', "
                "not %r", self.output_format,
            )
        if self.output_format == "accepted":
            # reference-exact chains: one row per accepted point with its
            # repeat count as weight — requires recording EVERY step
            # (records_per_epoch is ignored; memory scales with
            # learn_every * n_chains * d)
            self.mpi_info(
                "output_format=accepted: recording every step for exact "
                "accepted-point/repeat-weight chain files."
            )
        if self.drag and len(blocks) < 2:
            self.mpi_warning("Dragging requested but there is only one "
                             "block; disabling.")
            self.drag = False
        # --- initial covmat & proposal ----------------------------------------------
        covmat = None
        if self.output and self.output.is_resuming():
            covmat = self.load_covmat_checkpoint()
        if covmat is None:
            covmat = self.initial_proposal_covmat()
        # reference semantics (mcmc.py:419-429): a missing/incomplete initial
        # covmat starts proposal learning earlier — permanently, not for a
        # fixed number of checks
        if getattr(self, "covmat_fallback_params", None) and \
                self.learn_proposal:
            self.mpi_info(
                "Covariance matrix not complete (fallback widths used for "
                "%d param(s)). We will start learning the covariance of the "
                "proposal earlier: R-1 = %g (would be %g if all params "
                "loaded).", len(self.covmat_fallback_params),
                self.learn_proposal_Rminus1_max_early,
                self.learn_proposal_Rminus1_max,
            )
            self.learn_proposal_Rminus1_max = \
                self.learn_proposal_Rminus1_max_early
        self._set_proposal(covmat)
        self._setup_tlog("proposal")
        # cycled-direction state persists across proposal updates (the
        # cycler lives in whitened j-space, independent of the covariance)
        from ...ops.proposal import DirectionCycler

        self._dir_cycler = DirectionCycler(self._proposal, self.rng) \
            if self.proposal_directions == "cycled" else None
        # --- compiled posterior ----------------------------------------------------
        self._logpost_fn = model.make_logposterior_fn()
        # with >1 block, use the work-avoiding cached evaluator so only the
        # components footprinted by the moved block recompute (fast/slow)
        if len(blocks) > 1:
            self._full_eval, self._block_eval = (
                model.make_blocked_logposterior_fn(self._block_indices)
            )
        else:
            self._full_eval = self._block_eval = None
        # hoist the components' static data tables (covariances, binning
        # matrices, templates) out of every program that traces the
        # posterior: they become device-resident jit arguments instead of
        # HLO literal constants (ops/hoist.py; the flagship cosmology
        # program carried >1 GB of such constants before this)
        from ...ops import hoist as hoist_ops

        self._consts = hoist_ops.device_consts(
            hoist_ops.collect(self._logpost_fn, np.zeros(self.d))
        )
        self._setup_tlog("consts hoisted")
        periodic, bounds = model.prior.periodic_params_bounds
        wrap = model.prior.reduce_periodic if np.any(periodic) else None
        # record emission policy must be known before the epoch compiles:
        # records are sliced to the fetched subset inside the scan (full x
        # only when the CL-bounds ring consumes it)
        self._n_fetch = min(self.fetch_chains or self.n_chains,
                            self.n_chains)
        if self.Rminus1_cl_stop >= 100:
            # the CL test can never bind (e.g. benchmarks): skip the ring
            self.cl_bounds_records = 0
        self._epoch_wrap = wrap
        self._build_epoch_fn(wrap, blocks)
        self._build_remix_fn()
        self._setup_tlog("epoch_fn built")
        # on-device epoch diagnostics: everything the host needs, tiny.
        # (the tunnel-TPU backend moves data at ~0.5 MB/s, so cross-chain
        # statistics are reduced on device; only scalars + a (d, d) matrix
        # + a small record subsample cross to the host each epoch)
        from ...ops.convergence import rminus1_of_moments_jax

        # nested R-hat (Margossian et al. arXiv:2110.13017): group walkers
        # into superchains so the stationary noise floor of the R-1 test
        # scales as tau/(n * walkers_per_group) instead of tau/n.  0 = off
        # (every walker its own chain, the strictest reading of the
        # reference's per-chain test, mcmc.py:773-1032)
        G = int(self.Rminus1_n_groups or 0)
        if G > 1:
            G = min(G, self.n_chains)
            while self.n_chains % G:
                G -= 1
            if G <= 1:
                G = 0
            elif G != int(self.Rminus1_n_groups):
                self.mpi_info(
                    "Rminus1_n_groups %s -> %d (must divide n_chains=%d)",
                    self.Rminus1_n_groups, G, self.n_chains)
        else:
            G = 0
        self._r_groups = G
        if G:
            self.mpi_info(
                "Convergence: nested R-1 over %d superchains of %d walkers "
                "(group-clustered starting points).", G, self.n_chains // G)

        def window_stats(mom: mom_ops.Moments):
            mean_of_covs = mom_ops.mean_of_covs(mom)
            # weighted mean-of-means + total weight: the sufficient extra
            # statistics to pool cov_of_means across processes exactly
            counts = mom.count
            w = counts / jnp.maximum(jnp.sum(counts), 1.0)
            mu = jnp.einsum("c,ci->i", w, mom_ops.mean(mom))
            if G:
                B, V = mom_ops.grouped_between_within(mom, G)
                within = mean_of_covs + V
                return (rminus1_of_moments_jax(within, B),
                        within, B, mu, jnp.sum(counts))
            cov_of_means = mom_ops.cov_of_means(mom)
            return (rminus1_of_moments_jax(mean_of_covs, cov_of_means),
                    mean_of_covs, cov_of_means, mu, jnp.sum(counts))

        def epoch_stats(carry):
            return (window_stats(carry.mom), window_stats(carry.mom2),
                    jnp.mean(carry.n_accepted.astype(jnp.float32)),
                    jnp.max(carry.rejects_streak))

        self._stats_fn = jax.jit(epoch_stats)
        # device-side ring of recent records: CL-bound quantiles over ALL
        # walkers on device (the host only sees 3 small vectors), replacing
        # the reference's host-side getdist intervals (mcmc.py:918-1002)
        self._ring = None
        self._ring_len = 0
        self._ring_stride = 1
        self._rec_seen = 0
        if self.cl_bounds_records:
            from ...ops.convergence import cl_bounds_stats_jax

            M = int(self.cl_bounds_records)

            def ring_update(ring, new, pos):
                # preallocated circular buffer: write only the new rows
                # (a concat copy of the whole (M, C, d) ring per epoch is
                # pure wasted HBM bandwidth)
                n = new.shape[0]
                idx = (pos + jnp.arange(n)) % M
                return ring.at[idx].set(new), (pos + n) % M

            # donate the ring so XLA updates the buffer in place instead
            # of copying O(M C d) per epoch
            self._ring_update = jax.jit(ring_update, donate_argnums=0)
            self._ring_pos = 0
            self._cl_stats_fn = jax.jit(
                lambda ring: cl_bounds_stats_jax(
                    ring, confidence=self.Rminus1_cl_level
                )
            )
        import os as _os

        self._timing_epochs = bool(_os.environ.get("COBAYA_TPU_TIMING"))
        self._epoch_timing = {"compute": 0.0, "stats": 0.0, "fetch": 0.0,
                              "n": 0}
        # window reset decided at a collect, applied at the next dispatch
        # (keeps pipelined epochs' statistics consistent)
        self._pending_reset = None
        # --- state ----------------------------------------------------------------
        self.n_steps = 0  # per-walker steps completed (post burn-in counting all)
        self._win_steps = [0, 0]  # lengths of the two staggered windows
        self._records: list[dict] = []  # host copies of thinned records
        self._progress: list[dict] = []
        self.Rminus1_last = np.inf
        self.Rminus1_cl_last = np.inf
        self.converged = False
        self._checks_passed = 0
        self._accepted_prev = 0.0
        self._total_accepted_mean = 0.0
        self._t_start = time.time()
        self._t_last_print = 0.0
        self._carry = None
        if self.output and self.output.is_resuming():
            self._try_resume()
        if self._carry is None:
            self._init_points()
        self._setup_tlog("init_points")
        # output collections (subset of walkers written as chain files)
        self._collections = self._make_collections()
        self.mpi_info(
            "Sampling with %d walkers, %d params, %d block(s) %s, "
            "oversampling %s, learn_every=%d steps.",
            self.n_chains, self.d, len(blocks),
            [len(b) for b in blocks], self._oversampling.tolist(),
            self._learn_every,
        )

    # ------------------------------------------------------------------
    def _shard(self, carry):
        """Shard the walker state over the device mesh (no-op single-chip)."""
        if self._mesh is None:
            return carry
        from ...parallel.mesh import shard_batch_pytree

        return shard_batch_pytree(carry, self._mesh)

    def _set_proposal(self, covmat: np.ndarray):
        import jax.numpy as jnp

        self._proposal = build_blocked_proposal(
            covmat, self._block_indices,
            oversampling_factors=self._oversampling,
            proposal_scale=self.proposal_scale,
        )
        self._prop_dev = (
            jnp.asarray(self._proposal.transforms, self._dtype),
            jnp.asarray(self._proposal.dir_mask, self._dtype),
            jnp.asarray(self._proposal.block_sizes, jnp.int32),
            jnp.asarray(self._proposal.scale, self._dtype),
        )

    def _init_points(self):
        """Draw valid starting points for every walker (batched)."""
        import jax
        import jax.numpy as jnp

        model = self.model
        C = self.n_chains
        tlog = getattr(self, "_setup_tlog", lambda *_: None)

        # the whole initialization is ONE device program: the valid-point
        # search refills invalid lanes with fresh reference draws until
        # every walker's posterior is finite, and the initial carry is
        # built from the found points without them ever visiting the host.
        # Rationale (measured on the tunnel-TPU backend): eager dispatches
        # cost ~1s each, fetching a (C, d) array takes minutes, and every
        # distinct jit program pays a slow remote compile — so host code
        # here may fetch nothing, dispatch nothing eagerly, and should add
        # no extra programs.  The "all walkers valid" flag stays on device
        # and is checked after warm-up (see maybe_check_init) so its fetch
        # overlaps the epoch compile.
        rounds = int(np.clip(10 * self._max_tries // max(self.d, 1) // 16,
                             16, 256))

        from ...ops import hoist as hoist_ops

        def init_state(key):
            def cond(state):
                i, _, _, ok = state
                return (i < rounds) & ~jnp.all(ok)

            def body(state):
                i, key, x, ok = state
                key, k = jax.random.split(key)
                draw = jnp.asarray(model.prior.reference_jax(k, (C,)),
                                   self._dtype)
                lp, *_ = jax.vmap(self._logpost_fn)(draw)
                good = jnp.isfinite(lp)
                take = good & ~ok
                x = jnp.where(take[:, None], draw, x)
                return i + 1, key, x, ok | good

            state = (jnp.zeros((), jnp.int32), key,
                     jnp.zeros((C, self.d), self._dtype),
                     jnp.zeros((C,), bool))
            # while_loop (not fori): stops drawing as soon as every lane is
            # valid, so host-callback likelihoods see no extra evaluations
            # (the drag/oversampling eval-count semantics depend on this)
            _, key, x, ok = jax.lax.while_loop(cond, body, state)
            G = getattr(self, "_r_groups", 0)
            if G:
                # nested R-hat construction (arXiv:2110.13017): all walkers
                # of a superchain share one starting point, so the between-
                # superchain term retains initialization memory and the
                # grouped test cannot pass before starts are forgotten
                x = jnp.repeat(x[:G], C // G, axis=0)
                ok = jnp.repeat(ok[:G], C // G, axis=0)
            key, k_carry = jax.random.split(key)
            carry = init_carry(k_carry, x, self._logpost_fn,
                               dtype=self._dtype,
                               full_eval=self._full_eval,
                               temperature=self.temperature)
            return carry, jnp.all(ok)

        init_state = hoist_ops.jit_with_consts(init_state, self._consts)
        carry, self._init_all_ok = init_state(self.next_jax_key())
        tlog("ip: dispatched")
        self._carry = self._shard(carry)
        tlog("ip: sharded")

    def maybe_check_init(self):
        """Verify the deferred on-device valid-point search succeeded."""
        import jax

        flag = getattr(self, "_init_all_ok", None)
        if flag is None:
            return
        self._init_all_ok = None
        if not bool(jax.device_get(flag)):
            raise LoggedError(
                self.log,
                "Could not find valid starting points for all %d walkers. "
                "Check priors/likelihoods or provide better 'ref's.",
                self.n_chains,
            )
        self.mpi_info("Initial points found for all %d walkers.",
                      self.n_chains)

    def _jit_init_carry(self, key, x):
        """Build the initial carry in one jitted device call (see
        _init_points on eager-dispatch latency)."""
        import jax

        from ...ops import hoist as hoist_ops

        make = hoist_ops.jit_with_consts(lambda k, x0: init_carry(
            k, x0, self._logpost_fn, dtype=self._dtype,
            full_eval=self._full_eval, temperature=self.temperature,
        ), self._consts)
        return make(key, x)

    def _make_collections(self):
        from ...parallel import state as pstate

        # can only write walkers that are actually fetched from the device
        n_out = min(self.output_chains, self.n_chains, self._n_fetch)
        # multi-process runs interleave chain numbers across ranks, like
        # the reference's one-chain-per-MPI-rank naming (output.py:546)
        offset = pstate.process_index() * n_out
        return [
            SampleCollection(
                self.model, self.output, name=str(offset + i + 1),
                resuming=bool(self.output and self.output.is_resuming()),
                temperature=self.temperature,
            )
            for i in range(n_out)
        ]

    @property
    def _record_keep(self) -> int:
        """Walkers whose records the epoch emits (fetched subset)."""
        return min(self._n_fetch, self.n_chains)

    def _build_epoch_fn(self, wrap, blocks):
        """Construct the jitted epoch function (hook for kernel variants)."""
        from ...ops import hoist as hoist_ops

        self._built_record_keep = self._record_keep
        if self.proposal_directions not in ("random", "cycled"):
            raise LoggedError(
                self.log, "proposal_directions must be 'random' or "
                "'cycled', got %r", self.proposal_directions,
            )
        if self.drag:
            if self.proposal_directions == "cycled":
                self.mpi_warning(
                    "Dragging keeps fresh random directions; "
                    "'proposal_directions: cycled' applies to the plain "
                    "Metropolis kernel only."
                )
            from ...ops.dragging import make_drag_epoch_fn

            n_slow = len(blocks[0])
            n_fast = sum(len(b) for b in blocks[1:])
            self._drag_interp_steps = max(
                1, int(np.round(self._oversampling[-1] * n_fast / n_slow))
            )
            self.mpi_info("Dragging with %d interpolating steps.",
                          self._drag_interp_steps)
            self._epoch_fn = hoist_ops.jit_with_consts(make_drag_epoch_fn(
                self._logpost_fn, wrap, self.temperature,
                block_eval=self._block_eval,
                drag_interp_steps=self._drag_interp_steps,
                record_keep=self._record_keep,
                full_x_records=bool(self.cl_bounds_records),
            ), self._consts)
        else:
            cycled = self.proposal_directions == "cycled"
            self._epoch_fn = hoist_ops.jit_with_consts(
                make_epoch_fn(self._logpost_fn, wrap, self.temperature,
                              block_eval=self._block_eval,
                              cycled_directions=cycled,
                              record_keep=self._record_keep,
                              full_x_records=bool(self.cl_bounds_records)),
                self._consts,
            )

    def _build_remix_fn(self):
        """Construct the jitted ensemble-remix kernel (ops/remix.py).

        Kernel-independent: the remix move is an exact MH update on the
        shared ``MCMCCarry``, so it composes with any epoch kernel
        (plain Metropolis, dragging, HMC) — built here, outside
        ``_build_epoch_fn``, so kernel subclasses inherit it.
        """
        from ...ops import hoist as hoist_ops

        self._remix_fn = None
        if self.ensemble_remix:
            if self.n_chains < 4:
                self.mpi_warning(
                    "ensemble_remix requires >= 4 walkers; disabled.")
            else:
                from ...ops.remix import make_remix_fn

                self._remix_fn = hoist_ops.jit_with_consts(make_remix_fn(
                    self._logpost_fn, full_eval=self._full_eval,
                    temperature=self.temperature,
                    inflate=self.remix_inflate,
                    matmul_precision=self.model.matmul_precision,
                ), self._consts)

    def _direction_xs(self, schedule: np.ndarray, cycler=None) -> tuple:
        """Per-step cycled SO(n) directions as extra scan inputs
        (empty tuple in 'random' mode).  ``cycler`` overrides the
        persistent one (warmup uses a throwaway so it does not advance
        the sampling stream)."""
        if self.proposal_directions != "cycled" or self.drag:
            return ()
        import jax.numpy as jnp

        cycler = cycler or self._dir_cycler
        dirs = cycler.directions_for(schedule.ravel())
        return (jnp.asarray(dirs.reshape(schedule.shape + (-1,)),
                            self._dtype),)

    def _epoch_shape(self, n_steps: int):
        if self.output_format == "accepted":
            return n_steps, 1
        thin = max(1, int(np.ceil(n_steps / self.records_per_epoch)),
                   self._output_thin)
        n_rec = max(1, n_steps // thin)
        return n_rec, thin

    def warmup(self):
        """Compile the epoch and stats programs without advancing the chain.

        The epoch function is pure: running it once on the initial carry and
        discarding the result costs one epoch of compute and leaves the
        sampler state untouched, so benchmarks can exclude (one-time,
        cacheable) compilation from timed sampling.
        """
        import jax
        import jax.numpy as jnp

        n_rec, thin = self._epoch_shape(self._learn_every)
        # compile exactly the program shape the run dispatches: under
        # max_steps_per_dispatch that is the chunk, not the full epoch
        n_rec = self._dispatch_chunk_recs(n_rec, thin)
        schedule = make_block_schedule(
            self._proposal, n_rec * thin, np.random.default_rng(0)
        ).reshape(n_rec, thin)
        from ...ops.proposal import DirectionCycler

        throwaway = DirectionCycler(self._proposal, np.random.default_rng(0))
        tlog = getattr(self, "_setup_tlog", lambda *_: None)
        carry, recs = self._epoch_fn(
            self._carry, jnp.asarray(schedule),
            *self._direction_xs(schedule, cycler=throwaway), *self._prop_dev
        )
        tlog("warmup dispatch")
        stats = self._stats_fn(carry)
        self.maybe_check_init()
        jax.block_until_ready((carry.x, stats))
        tlog("warmup ready")
        self.mpi_info("Warm-up compilation done.")

    # ------------------------------------------------------------------
    # main loop
    # ------------------------------------------------------------------
    def run(self):
        """Sample until convergence (R-1 criteria) or max_samples."""
        self.maybe_check_init()
        self.mpi_info("Sampling!")
        import jax

        # burn-in epochs (records discarded)
        while self.n_steps < self._burn_in:
            steps = min(self._learn_every, self._burn_in - self.n_steps)
            self._run_epoch(steps, record=False)
        if self._burn_in:
            self._carry = reset_moments(self._carry)
            self._win_steps = [0, 0]
            self._ring = None
            self._ring_len = 0
            self._ring_stride = 1
            self._ring_pos = 0
            self._rec_seen = 0
        # pipelined epochs: the next epoch is dispatched before the
        # previous one's statistics reach the host, hiding the host link
        # round-trip behind device compute.  Proposal/reset updates then
        # take effect one epoch later (valid adaptive MCMC: the proposal
        # still only changes at epoch boundaries).  With file output the
        # checkpoint transfer serializes epochs anyway (and exact resume
        # requires records to match the saved state), so speculation is
        # only used without output.
        pipelined = bool(self.pipeline_epochs) and not self.output
        pending = None
        t_loop0 = time.time()
        hit_wall = False
        n_dispatched = 0

        def remix_due(i_epoch: int) -> bool:
            return bool(self._remix_fn is not None and self.remix_every
                        and i_epoch % self.remix_every == 0)

        def dispatch_next():
            # the remix rides the dispatch: an async device call chained in
            # front of the epoch program, so pipelined speculation keeps the
            # device busy through remix epochs (no host round-trip; in
            # pipelined mode the move lags the stats by one epoch, exactly
            # like proposal updates — validity is unaffected since the
            # remix kernel does not depend on the collected stats)
            nonlocal n_dispatched
            n_dispatched += 1
            if remix_due(n_dispatched):
                self._apply_remix()
            return self._dispatch_epoch(self._learn_every)

        while not self.converged and self.n_steps < self.max_samples:
            # at least one epoch always runs, so a too-small budget still
            # yields a usable (if unconverged) sample
            if (self.max_wall and self.n_steps
                    and time.time() - t_loop0 > self.max_wall):
                hit_wall = True
                break
            current = pending or dispatch_next()
            pending = None
            if pipelined and (
                self.n_steps + 2 * current["total"] <= self.max_samples
            ):
                pending = dispatch_next()
            self._collect_epoch(current)
            self._check_convergence_and_learn_proposal()
            self._write_checkpoint()
            if self.callback_function and self.callback_every and (
                len(self._progress) % self.callback_every == 0
            ):
                self.callback_function(self)
        if pending is not None:
            # the speculative epoch is valid post-convergence sampling:
            # collect its records instead of discarding the device work
            self._collect_epoch(pending)
        if self.converged:
            self.mpi_info(
                "Convergence reached: R-1 = %.4g (means), %.4g (CL bounds) "
                "after %d steps/walker (%d total posterior evals).",
                self.Rminus1_last, self.Rminus1_cl_last, self.n_steps,
                self.n_steps * self.n_chains,
            )
        elif hit_wall:
            self.mpi_warning(
                "Stopped at the max_wall=%ss wall-clock budget without "
                "convergence (R-1 = %.4g).", self.max_wall,
                self.Rminus1_last,
            )
        else:
            self.mpi_warning(
                "Stopped at max_samples=%s without convergence "
                "(R-1 = %.4g).", self.max_samples, self.Rminus1_last,
            )
        if self._timing_epochs and self._epoch_timing["n"]:
            t = self._epoch_timing
            self.mpi_info(
                "Epoch timing over %d epochs: compute %.2fs, stats %.2fs, "
                "host fetch %.2fs (%.0f%% of wall).", t["n"], t["compute"],
                t["stats"], t["fetch"],
                100 * t["fetch"] / max(t["compute"] + t["stats"]
                                       + t["fetch"], 1e-9),
            )
        self._flush_output(final=True)

    def _apply_remix(self):
        """One ensemble independence-remix move (ops/remix.py).

        Exact MH on the product chain; dispatched asynchronously — the
        acceptance fraction rides the next epoch's bundled stats fetch
        (no extra device sync) and shows in the progress line.
        """
        carry, acc = self._remix_fn(self._carry)
        self._carry = carry
        self._remix_acc_dev = acc

    def _dispatch_chunk_recs(self, n_rec: int, thin: int) -> int:
        """Record-rows per device call under ``max_steps_per_dispatch``.

        Returns the largest divisor of ``n_rec`` whose step count fits the
        limit, so every chunk has the same shape (one compiled program).
        """
        limit = getattr(self, "max_steps_per_dispatch", None)
        if not limit:
            return n_rec
        max_rec = max(1, int(read_dnumber(limit, self.d)) // max(thin, 1))
        if max_rec >= n_rec:
            return n_rec
        for c in range(max_rec, 0, -1):
            if n_rec % c == 0:
                return c
        return 1

    def _dispatch_epoch(self, n_steps: int, record: bool = True) -> dict:
        """Dispatch one epoch + its on-device statistics (non-blocking).

        Window resets decided at the previous collect apply here, so the
        dispatched epoch's statistics always match the bookkeeping snapshot
        stored with it (pipelined mode dispatches the next epoch before the
        previous one's statistics reach the host).
        """
        import jax
        import jax.numpy as jnp

        if self._pending_reset is not None:
            which = self._pending_reset
            self._pending_reset = None
            self._carry = reset_moments(self._carry, which)
            if which in ("mom", "both"):
                self._win_steps[0] = 0
            if which in ("mom2", "both"):
                self._win_steps[1] = 0
        # rebuild the epoch program if the fetched-subset size changed
        # after construction (e.g. the bench's wide validation fetch)
        if getattr(self, "_built_record_keep", None) != self._record_keep:
            self._build_epoch_fn(self._epoch_wrap, self._blocks)
        n_rec, thin = self._epoch_shape(n_steps)
        total = n_rec * thin
        if not hasattr(self, "_schedule_carry"):
            self._schedule_carry = [None]
        schedule = make_block_schedule(
            self._proposal, total, self.rng,
            carryover=self._schedule_carry,
        ).reshape(n_rec, thin)
        chunk = self._dispatch_chunk_recs(n_rec, thin)
        if chunk == n_rec:
            carry, recs = self._epoch_fn(
                self._carry, jnp.asarray(schedule),
                *self._direction_xs(schedule), *self._prop_dev
            )
        else:
            # bounded-dispatch mode: split the epoch into equal-shape
            # chained device calls (one compiled program, several async
            # dispatches — no host sync in between).  Some backends kill
            # executions past a wall/instruction budget (the tunneled-TPU
            # remote service faults on ~100s dispatches of the
            # gradient-heavy cosmology HMC epoch); chunking bounds each
            # call while keeping epoch semantics identical.
            carry = self._carry
            recs_parts = []
            dirs = self._direction_xs(schedule)
            for s in range(0, n_rec, chunk):
                sched_i = jnp.asarray(schedule[s:s + chunk])
                dirs_i = tuple(d[s:s + chunk] for d in dirs)
                carry, recs_i = self._epoch_fn(
                    carry, sched_i, *dirs_i, *self._prop_dev)
                recs_parts.append(recs_i)
            recs = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *recs_parts)
        self._carry = carry
        self._win_steps = [w + total for w in self._win_steps]
        if record and self.cl_bounds_records:
            self._ring_append(recs.x, thin)
        nf = self._n_fetch
        fetch_recs = jax.tree.map(lambda a: a[:, :nf], recs) if record \
            else None
        remix_acc = getattr(self, "_remix_acc_dev", None)
        self._remix_acc_dev = None
        return {
            "carry": carry, "recs": fetch_recs, "thin": thin,
            "total": total, "record": record,
            "stats": self._stats_fn(carry),
            "remix_acc": remix_acc,
            "win_steps": list(self._win_steps),
        }

    def _collect_epoch(self, ep: dict):
        """Fetch an epoch's statistics + record subsample (ONE bundled
        device transfer) and process them."""
        import jax

        if self._timing_epochs:
            import time as _time

            t0 = _time.perf_counter()
            jax.block_until_ready(ep["carry"].x)
            t1 = _time.perf_counter()
            jax.block_until_ready(jax.tree.leaves(ep["stats"]))
            t2 = _time.perf_counter()
            stats_h, recs_h = jax.device_get((ep["stats"], ep["recs"]))
            t3 = _time.perf_counter()
            self._epoch_timing["compute"] += t1 - t0
            self._epoch_timing["stats"] += t2 - t1
            self._epoch_timing["fetch"] += t3 - t2
            self._epoch_timing["n"] += 1
        else:
            stats_h, recs_h = jax.device_get((ep["stats"], ep["recs"]))
        if ep.get("remix_acc") is not None:
            # rides the same (already synced) epoch boundary; a scalar
            self._remix_acc_last = float(jax.device_get(ep["remix_acc"]))
        total, thin = ep["total"], ep["thin"]
        self.n_steps += total
        (stats_a, stats_b, acc_mean, streak) = stats_h
        from ...parallel import state as pstate

        if pstate.more_than_one_process():
            # pool the window statistics across processes (the reference's
            # cross-MPI R-1, /root/reference/cobaya/samplers/mcmc/mcmc.py:791)
            state = pstate.get_current_state()
            if state is not None:
                state.check_error()
            gathered = pstate.allgather(
                ([np.asarray(s) for s in stats_a],
                 [np.asarray(s) for s in stats_b],
                 float(acc_mean), int(streak)),
                tag="epoch-stats",
            )
            stats_a = _pool_window_stats([g[0] for g in gathered])
            stats_b = _pool_window_stats([g[1] for g in gathered])
            acc_mean = float(np.mean([g[2] for g in gathered]))
            streak = max(g[3] for g in gathered)
        # primary window = the longer one (snapshot taken at dispatch)
        win_steps = ep["win_steps"]
        primary = 0 if win_steps[0] >= win_steps[1] else 1
        rminus1, mean_of_covs, cov_of_means = (stats_a, stats_b)[primary][:3]
        self._last_stats = {
            "rminus1": float(rminus1),
            "mean_of_covs": np.asarray(mean_of_covs, float),
            "cov_of_means": np.asarray(cov_of_means, float),
        }
        if ep["record"] and recs_h is not None:
            host_recs = {
                "x": np.asarray(recs_h.x, np.float32),
                "logpost": np.asarray(recs_h.logpost, np.float32),
                "logpriors": np.asarray(recs_h.logpriors, np.float32),
                "loglikes": np.asarray(recs_h.loglikes, np.float32),
                "derived": np.asarray(recs_h.derived, np.float32),
                "thin": thin,
            }
            self._records.append(host_recs)
            self._append_to_collections(host_recs)
        # stuck-walker detection
        if int(streak) >= self._max_tries:
            raise LoggedError(
                self.log,
                "Some walker has been stuck for %d consecutive tries "
                "(max_tries=%d). The posterior may be too concentrated "
                "relative to the proposal, or have unphysical regions.",
                int(streak), self._max_tries,
            )
        # progress printing
        now = time.time()
        new_acc = float(acc_mean)
        self._acceptance_rate = (new_acc - self._accepted_prev) / total
        self._accepted_prev = new_acc
        self._total_accepted_mean = new_acc
        if now - self._t_last_print > self._output_every.value:
            remix_acc = getattr(self, "_remix_acc_last", None)
            self.mpi_info(
                "%d steps/walker (%.2g posterior evals/s), acceptance %.3f, "
                "R-1 %.4g%s", self.n_steps,
                self.n_steps * self.n_chains / (now - self._t_start),
                self._acceptance_rate, self.Rminus1_last,
                "" if remix_acc is None else
                ", remix acceptance %.3f" % remix_acc,
            )
            self._t_last_print = now

    def _run_epoch(self, n_steps: int, record: bool = True):
        self._collect_epoch(self._dispatch_epoch(n_steps, record=record))

    def _append_to_collections(self, recs: dict):
        for i, coll in enumerate(self._collections):
            coll.append_batch(
                recs["x"][:, i], recs["logpost"][:, i],
                recs["logpriors"][:, i], recs["loglikes"][:, i],
                recs["derived"][:, i],
                weights=np.full(len(recs["x"]), recs["thin"], float),
            )

    # ------------------------------------------------------------------
    # convergence & proposal learning (reference mcmc.py:773-1032)
    # ------------------------------------------------------------------
    def _check_convergence_and_learn_proposal(self):
        """R-1 gate + proposal learning from the on-device moment window.

        The reference recomputes mean/cov of the *second half* of each chain
        at every check (mcmc.py:791); here per-walker moments accumulate on
        device in a window that is reset whenever it exceeds half the total
        chain length, giving an amortized recent-half window without ever
        shipping per-chain covariances to the host.
        """
        if not hasattr(self, "_last_stats"):
            return
        if self.model.timing:
            self.model.dump_timing()
        rminus1_prev = self.Rminus1_last
        self.Rminus1_last = self._last_stats["rminus1"]
        self.mpi_info(
            "Convergence check: R-1(means) = %.4g (stop at %.3g) after %d "
            "steps/walker.", self.Rminus1_last, self.Rminus1_stop,
            self.n_steps,
        )
        # the means criterion must hold on two consecutive checks
        # (reference mcmc.py:907-908: max(Rminus1, Rminus1_last) < stop)
        converged_means = max(self.Rminus1_last,
                              rminus1_prev) < self.Rminus1_stop
        if converged_means:
            self.Rminus1_cl_last = self._check_cl_bounds()
            self.mpi_info(
                "Convergence check: R-1(%.0f%% bounds) = %.4g (stop at %.3g)",
                100 * self.Rminus1_cl_level, self.Rminus1_cl_last,
                self.Rminus1_cl_stop,
            )
            if self.Rminus1_cl_last < self.Rminus1_cl_stop:
                self._checks_passed += 1
            else:
                self._checks_passed = 0
        else:
            self._checks_passed = 0
        if self._checks_passed >= max(self.Rminus1_n_checks - 1, 1):
            self.converged = True
        # proposal learning (learn_proposal_Rminus1_max was raised to the
        # "early" value at initialization when the covmat was incomplete)
        if (
            self.learn_proposal and not self.converged
            and self.learn_proposal_Rminus1_min < self.Rminus1_last
            < self.learn_proposal_Rminus1_max
        ):
            cov = regularize_learned_covmat(
                self._last_stats["mean_of_covs"])
            try:
                self._set_proposal(cov)
                self.mpi_info("Updated proposal covariance from walker "
                              "statistics.")
            except LoggedError:
                self.mpi_warning(
                    "Learned covariance not positive-definite; keeping the "
                    "previous proposal."
                )
        # staggered recent-half windows: reset the longer window once the
        # shorter one covers a quarter of the chain, so the stats window
        # always spans roughly the recent half (reference uses literal
        # second-half recomputation, mcmc.py:791)
        if not self.converged:
            longer = 0 if self._win_steps[0] >= self._win_steps[1] else 1
            shorter = 1 - longer
            if self._win_steps[shorter] >= self.n_steps / 4:
                # applied at the next dispatch (keeps pipelined epochs'
                # statistics consistent with their bookkeeping snapshot)
                self._pending_reset = "mom" if longer == 0 else "mom2"
        self._progress.append({
            "N": self.n_steps,
            "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
            "acceptance_rate": float(
                self._total_accepted_mean / max(self.n_steps, 1)
            ),
            "Rminus1": float(self.Rminus1_last),
            "Rminus1_cl": float(self.Rminus1_cl_last),
        })

    def _ring_append(self, rx, thin: int):
        """Striding device ring: M records spanning ~ the recent half.

        The reference recomputes CL bounds on the literal second half of
        each chain (mcmc.py:918-1002); a fixed-size ring whose stride
        doubles whenever its span falls behind n_steps/2 keeps the same
        window with O(M C d) device memory and no chain storage.
        """
        import jax.numpy as jnp

        M = int(self.cl_bounds_records)
        n_rec = rx.shape[0]
        s = self._ring_stride
        # global record indices divisible by the stride get accepted
        start = (-self._rec_seen) % s
        idx = np.arange(start, n_rec, s)
        self._rec_seen += n_rec
        if idx.size:
            sel = rx[jnp.asarray(idx)] if idx.size < n_rec else rx
            if self._ring is None:
                # preallocate the full circular buffer once; unwritten
                # slots are filled with the first batch's rows (quantiles
                # are row-order independent and _ring_len gates readiness)
                self._ring = jnp.zeros((M,) + tuple(sel.shape[1:]),
                                       sel.dtype) + sel[-1]
                self._ring_pos = 0
            self._ring, self._ring_pos = self._ring_update(
                self._ring, sel, self._ring_pos
            )
            self._ring_len = min(self._ring_len + idx.size, M)
        # double the stride once the full ring spans less than half the
        # run: keep every other row (row order is irrelevant to the
        # quantiles) and let new writes refill the freed half
        while (self._ring_len >= M
               and self.n_steps // 2 > M * self._ring_stride * thin):
            half = self._ring[::2]
            # truncate to exactly M rows: with odd M, [::2] keeps (M+1)/2
            # rows and the doubled buffer would grow to M+1, leaving one
            # slot the modulo-M writer could never overwrite
            self._ring = jnp.concatenate([half, half], axis=0)[:M]
            self._ring_len = min(half.shape[0], M)
            self._ring_pos = int(self._ring_len) % M
            self._ring_stride *= 2

    def _check_cl_bounds(self) -> float:
        """Secondary R-1: spread of CL bounds across walkers.

        Primary path: quantiles over the device-side record ring, computed
        for ALL walkers on device; the host receives three small vectors
        per process and pools them (exactly) across processes.  Falls back
        to host quantiles over the fetched record subsample when the ring
        is disabled or empty (e.g. right after resume).
        """
        from ...parallel import state as pstate

        # require a full ring: until then some circular-buffer slots hold
        # duplicated rows, which would bias the quantiles tight
        # needs at least half the ring to be real rows: right after a
        # stride doubling the freed half holds duplicates, whose effect on
        # the quantile spread is small and fades as new records land
        if self.cl_bounds_records and self._ring is not None \
                and self._ring_len >= max(4, int(self.cl_bounds_records) // 2):
            import jax

            from ...ops.convergence import pool_cl_bounds_stats

            local = jax.device_get(self._cl_stats_fn(self._ring))
            per_proc = (pstate.allgather(local, tag="cl-bounds")
                        if pstate.more_than_one_process() else [local])
            return pool_cl_bounds_stats(per_proc)
        return self._check_cl_bounds_host()

    def _check_cl_bounds_host(self) -> float:
        """Host fallback: quantiles over the fetched record subsample."""
        n_ep = len(self._records)
        if n_ep == 0:
            return np.inf
        use = self._records[n_ep // 2:]
        xs = np.concatenate([r["x"] for r in use], axis=0)  # (n, C, d)
        xs = np.swapaxes(xs, 0, 1)  # (C, n, d)
        # subsample walkers for the quantile cost
        C = xs.shape[0]
        take = min(C, 64)
        idx = self.rng.choice(C, take, replace=False)
        xs = xs[idx]
        from ...parallel import state as pstate

        if pstate.more_than_one_process():
            # pool the walker subsamples so the CL-bound spread is computed
            # over the global population (reference mcmc.py:918-1002)
            xs = np.concatenate(
                pstate.allgather(xs, tag="cl-bounds"), axis=0
            )
        per_param = rminus1_cl_bounds(
            xs, None, confidence=self.Rminus1_cl_level
        )
        return float(per_param.max())

    # ------------------------------------------------------------------
    # checkpoint / resume / products
    # ------------------------------------------------------------------
    def _write_checkpoint(self):
        if not self.output:
            return
        from ...parallel import state as pstate

        self.write_checkpoint_info({
            "converged": bool(self.converged),
            "Rminus1_last": float(self.Rminus1_last),
            "Rminus1_cl_last": float(self.Rminus1_cl_last),
            "burn_in": 0 if self.n_steps >= self._burn_in else self._burn_in,
            "mpi_size": pstate.process_count(),
            "n_chains": self.n_chains,
            "n_steps": self.n_steps,
            "checks_passed": self._checks_passed,
        })
        self.dump_covmat(self._proposal.covmat)
        # progress table
        if self.progress_filename and pstate.is_main_process():
            with open(self.progress_filename, "w", encoding="utf-8") as f:
                f.write("# N  timestamp  acceptance_rate  Rminus1  "
                        "Rminus1_cl\n")
                for row in self._progress:
                    f.write(
                        f"{row['N']} {row['timestamp'].replace(' ', 'T')} "
                        f"{row['acceptance_rate']:.4f} {row['Rminus1']:.6g} "
                        f"{row['Rminus1_cl']:.6g}\n"
                    )
        # exact device state for resume (single bundled device transfer)
        if self.state_filename:
            import jax

            c = jax.device_get(self._carry._replace(
                key=jax.random.key_data(self._carry.key)
            ))
            np.savez(
                self.state_filename,
                key=np.asarray(c.key),
                x=np.asarray(c.x), logpost=np.asarray(c.logpost),
                logpriors=np.asarray(c.logpriors),
                loglikes=np.asarray(c.loglikes),
                derived=np.asarray(c.derived),
                weight=np.asarray(c.weight),
                n_accepted=np.asarray(c.n_accepted),
                rejects_streak=np.asarray(c.rejects_streak),
                n_steps=self.n_steps,
                covmat=self._proposal.covmat,
                win_steps=np.asarray(self._win_steps),
                seed_state=self.rng.bit_generator.state["state"]["state"],
            )
        self._flush_output()

    def _flush_output(self, final: bool = False):
        for coll in self._collections:
            coll.out_update(final=final)

    def _try_resume(self):
        import os

        import jax

        from ...parallel import state as pstate

        # refuse resuming with a different process count: per-rank state
        # files would not line up and chains would silently restart
        # (the reference refuses on MPI-size mismatch)
        old_size = (self.read_checkpoint_info() or {}).get("mpi_size")
        if old_size is not None and int(old_size) != pstate.process_count():
            raise LoggedError(
                self.log,
                "Cannot resume: the run was checkpointed with %s "
                "process(es), but this launch has %d. Relaunch with the "
                "same process count, or use force=True to start over.",
                old_size, pstate.process_count(),
            )
        fn = self.state_filename
        if not fn or not os.path.exists(fn):
            self.mpi_warning("Resume requested but no state file found; "
                             "starting fresh.")
            return
        data = np.load(fn)
        if data["x"].shape != (self.n_chains, self.d):
            raise LoggedError(
                self.log,
                "Cannot resume: stored state has %s walkers x params, "
                "requested (%d, %d).", data["x"].shape, self.n_chains, self.d,
            )
        import jax.numpy as jnp

        x = jnp.asarray(data["x"], self._dtype)
        cache = ()
        if self._full_eval is not None:
            from ...ops import hoist as hoist_ops

            cache = hoist_ops.jit_with_consts(
                jax.vmap(self._full_eval), self._consts)(x)[4]
        key_data = jnp.asarray(data["key"])
        if key_data.ndim > 1:
            # legacy per-walker key vectors: keep the first walker's stream
            key_data = key_data[0]
        carry = MCMCCarry(
            key=jax.random.wrap_key_data(key_data),
            x=x,
            logpost=jnp.asarray(data["logpost"], self._dtype),
            logpriors=jnp.asarray(data["logpriors"], self._dtype),
            loglikes=jnp.asarray(data["loglikes"], self._dtype),
            derived=jnp.asarray(data["derived"], self._dtype),
            weight=jnp.asarray(data["weight"], self._dtype),
            n_accepted=jnp.asarray(data["n_accepted"], jnp.int32),
            rejects_streak=jnp.asarray(data["rejects_streak"], jnp.int32),
            mom=mom_ops.init(x),
            mom2=mom_ops.init(x),
            cache=cache,
        )
        self._carry = self._shard(carry)
        self.n_steps = int(data["n_steps"])
        self._win_steps = [0, 0]  # windows restart at resume
        checkpoint = self.read_checkpoint_info() or {}
        self._checks_passed = int(checkpoint.get("checks_passed", 0))
        self.Rminus1_last = float(checkpoint.get("Rminus1_last", np.inf))
        self.Rminus1_cl_last = float(checkpoint.get("Rminus1_cl_last",
                                                    np.inf))
        # a previously-converged run only stays converged if it still meets
        # the (possibly changed) stopping criteria (reference sampler.py:349)
        if bool(checkpoint.get("converged")):
            self.converged = (
                self.Rminus1_last < self.Rminus1_stop
                and self.Rminus1_cl_last < self.Rminus1_cl_stop
            )
            if not self.converged:
                self.mpi_info(
                    "Resumed run was converged under the old criteria but "
                    "not the current ones; continuing sampling."
                )
        self._set_proposal(np.atleast_2d(data["covmat"]))
        self.mpi_info("Resumed at %d steps/walker.", self.n_steps)

    def products(self, combined: bool = False, skip_samples: float = 0,
                 to_getdist: bool = False) -> dict:
        """Return samples (all walkers, in-memory) + progress info."""
        sample = self.samples_all(skip=skip_samples)
        if to_getdist:
            sample = sample.to_getdist()
        return {
            "sample": sample,
            "progress": list(self._progress),
            "collections": self._collections,
        }

    def samples_all(self, skip: float = 0) -> SampleCollection:
        """One combined collection over all walkers' thinned records."""
        coll = SampleCollection(self.model, None, name="combined",
                                temperature=self.temperature)
        n_ep = len(self._records)
        first_ep = int(skip * n_ep) if 0 < skip < 1 else 0
        for r in self._records[first_ep:]:
            n_rec, C = r["x"].shape[:2]
            flat = lambda a: a.reshape((n_rec * C,) + a.shape[2:])
            coll.append_batch(
                flat(r["x"]), flat(r["logpost"]), flat(r["logpriors"]),
                flat(r["loglikes"]), flat(r["derived"]),
                weights=np.full(n_rec * C, r["thin"], float), rle=False,
            )
        return coll

    @classmethod
    def output_files_regexps(cls, output, info=None, minimal=False):
        regexps = [output.collection_regexp()]
        if not minimal:
            for ext in (cv.Extension.checkpoint, cv.Extension.progress,
                        cv.Extension.covmat):
                regexps.append(None)
        return regexps


def load_progress(prefix_or_file: str):
    """Load a run's .progress table as a dict of column arrays."""
    import os

    fn = prefix_or_file
    if not fn.endswith(cv.Extension.progress):
        fn = prefix_or_file + ".mcmc" + cv.Extension.progress
    if not os.path.exists(fn):
        raise LoggedError(None, "Progress file not found: %s", fn)
    rows = []
    with open(fn, encoding="utf-8") as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            n, ts, acc, r, rcl = line.split()
            rows.append((int(n), ts, float(acc), float(r), float(rcl)))
    cols = list(zip(*rows)) if rows else [[]] * 5
    return {
        "N": np.array(cols[0]), "timestamp": list(cols[1]),
        "acceptance_rate": np.array(cols[2]),
        "Rminus1": np.array(cols[3]), "Rminus1_cl": np.array(cols[4]),
    }


def plot_progress(prefix_or_file: str, ax=None, show: bool = False):
    """Plot acceptance rate and R-1 vs samples (reference mcmc.py:1223)."""
    try:
        import matplotlib.pyplot as plt
    except ImportError as exc:
        raise LoggedError(
            None, "matplotlib is required for plot_progress: %s", exc
        ) from exc
    progress = load_progress(prefix_or_file)
    if ax is None:
        _, ax = plt.subplots(2, 1, sharex=True)
    ax[0].plot(progress["N"], progress["acceptance_rate"], "o-")
    ax[0].set_ylabel("acceptance rate")
    ax[1].semilogy(progress["N"], progress["Rminus1"], "o-", label="means")
    finite = np.isfinite(progress["Rminus1_cl"])
    if finite.any():
        ax[1].semilogy(progress["N"][finite],
                       progress["Rminus1_cl"][finite], "x:",
                       label="CL bounds")
    ax[1].set_ylabel("R-1")
    ax[1].set_xlabel("steps per walker")
    ax[1].legend()
    if show:
        plt.show()
    return ax
