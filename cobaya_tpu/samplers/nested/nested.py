"""Nested sampler: native JAX reimplementation of PolyChord's capability.

Capability parity with /root/reference/cobaya/samplers/polychord/polychord.py
(which wraps external Fortran PolyChord): unit-hypercube prior scaling,
likelihood-constrained slice sampling with ``num_repeats`` passes, evidence
``logZ +/- logZstd`` (information-based error), posterior-weighted dead-point
samples, ``nlive``/``precision_criterion`` semantics, and the
``products()["sample"|"logZ"|"logZstd"]`` contract.  External priors are
folded into the effective likelihood (with the prior volume defined by the
separable 1D priors), as the reference does for unphysical-prior corrections.

TPU-first design: instead of Fortran killing one point at a time, each
*generation* kills the worst ``batch_size`` live points and regenerates them
with that many parallel whitened slice-sampling chains — one jitted call per
generation, vmapped over the batch, with fixed-iteration masked step-out /
shrink loops.  The evidence ledger (tiny, sequential) runs on host in f64
from one fetch per generation.  Posterior clusters with per-cluster
evidences are identified by friends-of-friends linking in whitened
coordinates.  With ``cluster_evolution`` (default on), the live points are
periodically FoF-clustered on the host and each slice chain whitens with
its own cluster's covariance (PolyChord-style cluster-aware evolution),
branchlessly inside the same jitted generation.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

from ...io.collection import SampleCollection
from ...utils import conventions as cv
from ...utils.log import LoggedError
from ...utils.tools import read_dnumber
from ..sampler import Sampler


class Nested(Sampler):
    file_base_name = "nested"

    nlive: Union[int, str]
    num_repeats: Union[int, str]
    precision_criterion: float
    batch_size: Optional[int]
    max_shrink: int
    max_ndead: float
    confidence_for_unbounded: float
    precision: str
    do_clustering: bool
    max_clusters: int
    cluster_evolution: bool
    cluster_every: int
    cluster_linking_scale: float
    checkpoint_every: int

    def initialize(self):
        import jax
        import jax.numpy as jnp

        model = self.model
        self.d = len(model.parameterization.sampled_params())
        self._nlive = read_dnumber(self.nlive, self.d)
        self._num_repeats = max(read_dnumber(self.num_repeats, self.d), 1)
        # multi-process: split the live points across processes — P
        # independent runs of nlive/P merge (by likelihood order) into one
        # statistically equivalent nlive run at ~P× the wall-clock speed,
        # the same capability PolyChord gets from MPI (Skilling 2006 §7;
        # reference wraps it, /root/reference/cobaya/samplers/polychord)
        from ...parallel import state as pstate

        self._nproc = pstate.process_count()
        self._nlive_total = self._nlive
        if self._nproc > 1:
            per = max((self._nlive + self._nproc - 1) // self._nproc,
                      self.d + 2, 8)
            self.mpi_info(
                "Multi-process nested sampling: %d processes x %d live "
                "points (nlive=%d total), merged at the end.",
                self._nproc, per, self._nlive_total,
            )
            self._nlive = per
        self._batch = int(self.batch_size or max(self._nlive // 8, 1))
        self._batch = min(self._batch, max(self._nlive // 2, 1))
        # shard the live-point population over the device mesh: the batch of
        # replacement slice chains is embarrassingly parallel, so live state
        # is placed with a chains-axis sharding and XLA runs the jitted
        # generation SPMD (same mechanism as the MCMC walkers)
        self._mesh = None
        if jax.local_device_count() > 1:
            from ...parallel.mesh import make_mesh, round_up_chains

            self._mesh = make_mesh()
            ndev = int(np.prod(self._mesh.devices.shape))
            self._nlive = round_up_chains(self._nlive, ndev)
            self._batch = round_up_chains(self._batch, ndev)
            self._batch = min(self._batch,
                              max(self._nlive // 2, ndev))
        self._dtype = jnp.dtype(self.precision)
        # --- cube transform tables (host-built ppf knots) ---------------------
        K = 1025
        eps = (1 - self.confidence_for_unbounded) / 2
        u_knots = np.linspace(0, 1, K)
        u_eval = np.clip(u_knots, eps, 1 - eps)
        tables = np.stack([
            dist.ppf(u_eval) for dist in model.prior.dists
        ])  # (d, K)
        if not np.all(np.isfinite(tables)):
            raise LoggedError(
                self.log, "Non-finite prior ppf values; check priors."
            )
        self._u_knots = u_knots
        self._tables = tables
        logpost_fn = model.make_logposterior_fn(clip_to_bounds=True)
        tab = jnp.asarray(tables, self._dtype)
        knots = jnp.asarray(u_knots, self._dtype)

        def cube_to_x(u):
            return jax.vmap(jnp.interp, in_axes=(0, None, 0))(u, knots, tab)

        def loglike_u(u):
            x = cube_to_x(u)
            _, logpriors, loglikes, derived = logpost_fn(x)
            # external priors fold into the effective likelihood for the
            # nested evolution; the full per-prior vector is kept for output
            ext = jnp.sum(logpriors[1:]) if logpriors.shape[0] > 1 else 0.0
            return jnp.sum(loglikes) + ext, (x, logpriors, loglikes, derived)

        self._cube_to_x = cube_to_x
        self._loglike_u = loglike_u
        # static data tables ride as jit arguments, not HLO constants
        from ...ops import hoist as hoist_ops

        self._consts = hoist_ops.device_consts(hoist_ops.collect(
            logpost_fn, np.zeros(self.d)))
        self._loglike_batch = hoist_ops.jit_with_consts(
            jax.vmap(lambda u: loglike_u(u)[0]), self._consts
        )
        self._decorate_batch = hoist_ops.jit_with_consts(
            jax.vmap(lambda u: loglike_u(u)), self._consts)
        # --- speed grades (PolyChord grade_dims/grade_frac capability) --------
        # with a fast/slow hierarchy, slice passes are split per block and
        # fast passes reuse the cached slow-component results per live point
        blocks, oversampling = model.get_param_blocking_for_sampler(
            oversample_power=0.4
        )
        self._blocks = blocks
        sampled = list(model.parameterization.sampled_params())
        self._block_indices = [
            [sampled.index(p) for p in b] for b in blocks
        ]
        if len(blocks) > 1:
            self._full_eval, self._block_eval = (
                model.make_blocked_logposterior_fn(
                    self._block_indices, clip_to_bounds=True,
                )
            )
            weights = np.array([
                len(b) * o for b, o in zip(blocks, oversampling)
            ], dtype=float)
            weights = weights / weights.sum()
            self._repeats_plan = [
                (i, max(1, int(round(self._num_repeats * w))))
                for i, w in enumerate(weights)
            ]
            self.mpi_info(
                "Nested speed grades: blocks %s, slice passes per "
                "replacement %s", [len(b) for b in blocks],
                [r for _, r in self._repeats_plan],
            )
        else:
            self._full_eval = self._block_eval = None
            self._repeats_plan = [(0, self._num_repeats)]
        self._generation = hoist_ops.jit_with_consts(
            self._make_generation(), self._consts)
        self.logZ = -np.inf
        self.logZstd = np.inf
        self._n_evals = 0

    # ------------------------------------------------------------------
    def _make_generation(self):
        import jax
        import jax.numpy as jnp

        d = self.d
        K = self._batch
        n = self._nlive
        max_step_out = 4
        max_shrink = int(self.max_shrink)
        loglike_u = lambda u: self._loglike_u(u)[0]
        graded = self._block_eval is not None
        # per-block masks over cube dimensions (sampled-parameter order)
        block_masks = np.zeros((len(self._block_indices), d))
        for b, idxs in enumerate(self._block_indices):
            block_masks[b, idxs] = 1.0
        block_masks_j = jnp.asarray(block_masks)
        cube_to_x = self._cube_to_x

        def eval_graded(b, u, cache):
            """(value, cache) under the likelihood constraint semantics."""
            x = cube_to_x(u)
            _, lpri, llik, _, cache_new = self._block_eval(b, x, cache)
            ext = jnp.sum(lpri[1:]) if lpri.shape[0] > 1 else 0.0
            return jnp.sum(llik) + ext, cache_new

        def slice_pass_for_block(b_static):
            """One slice pass restricted to block ``b_static``'s dims."""

            def slice_pass(carry, _):
                u, logL, cache, Lmin, key, whitens, n_ev = carry
                key, k_dir, k_r, k_shrink = jax.random.split(key, 4)
                mask = block_masks_j[b_static]
                g = jax.random.normal(k_dir, (d,)) * mask
                direction = whitens[b_static] @ (
                    g / jnp.maximum(jnp.linalg.norm(g), 1e-30)
                )
                w = 1.0
                r = jax.random.uniform(k_r)
                lo0, hi0 = -w * r, w * (1 - r)

                def check(t):
                    cand = u + t * direction
                    inside = jnp.all((cand >= 0) & (cand <= 1))
                    cand_c = jnp.clip(cand, 0, 1)
                    if graded:
                        val, cache_new = eval_graded(b_static, cand_c, cache)
                    else:
                        val, cache_new = loglike_u(cand_c), cache
                    val = jnp.where(inside, val, -jnp.inf)
                    return val > Lmin, val, cache_new

                # early-exit loops: under vmap, while_loop runs only while
                # ANY lane is active, so host-callback evaluations stop as
                # soon as every walker's interval is settled
                def step_out(bound, sign):
                    def cond(state):
                        _, active, i, _ = state
                        return active & (i < max_step_out)

                    def body(state):
                        bnd, active, i, ne = state
                        ok, _, _ = check(bnd)
                        return (jnp.where(ok, bnd + sign * w, bnd), ok,
                                i + 1, ne + 1)

                    bnd, _, _, ne = jax.lax.while_loop(
                        cond, body, (bound, True, 0, 0)
                    )
                    return bnd, ne

                lo, ne1 = step_out(lo0, -1.0)
                hi, ne2 = step_out(hi0, +1.0)
                n_ev = n_ev + ne1 + ne2

                def shrink_cond(state):
                    _, _, _, _, _, done, _, i, _ = state
                    return (~done) & (i < max_shrink)

                def shrink_body(state):
                    lo, hi, u_new, logL_new, cache_cur, done, key, i, ne = (
                        state
                    )
                    key, k_t = jax.random.split(key)
                    t = jax.random.uniform(k_t, minval=lo, maxval=hi)
                    ok, val, cache_new = check(t)
                    u_out = jnp.where(
                        ok, jnp.clip(u + t * direction, 0, 1), u_new
                    )
                    logL_out = jnp.where(ok, val, logL_new)
                    cache_out = jax.tree.map(
                        lambda a, c: jnp.where(ok, a, c),
                        cache_new, cache_cur,
                    )
                    lo = jnp.where((~ok) & (t < 0), t, lo)
                    hi = jnp.where((~ok) & (t >= 0), t, hi)
                    return (lo, hi, u_out, logL_out, cache_out, ok, key,
                            i + 1, ne + 1)

                (lo, hi, u_new, logL_new, cache_new, done, key, _,
                 ne) = jax.lax.while_loop(
                    shrink_cond, shrink_body,
                    (lo, hi, u, logL, cache, False, k_shrink, 0, 0),
                )
                n_ev = n_ev + ne
                # on total failure stay at the current point
                return (u_new, logL_new, cache_new, Lmin, key, whitens,
                        n_ev), None

            return slice_pass

        def replace_one(u_start, logL_start, cache_start, Lmin, whitens,
                        key):
            carry = (u_start, logL_start, cache_start, Lmin, key, whitens, 0)
            # static python loop over grades: separate scans per block
            for b, reps in self._repeats_plan:
                carry, _ = jax.lax.scan(
                    slice_pass_for_block(b), carry, None, length=reps
                )
            u, logL, cache, _, _, _, n_ev = carry
            return u, logL, cache, n_ev

        def generation(u_live, logL_live, cache_live, key, cluster_ids,
                       cluster_whitens, use_clusters):
            order = jnp.argsort(logL_live)
            kill = order[:K]
            survive = order[K:]
            Lmin = logL_live[kill[-1]]  # the highest of the killed
            dead_u = u_live[kill]
            dead_logL = logL_live[kill]
            # per-block whitening from surviving live points (padded chol of
            # the block's sub-covariance; zero outside the block dims)
            us = u_live[survive]
            mu = us.mean(0)
            cov = (us - mu).T @ (us - mu) / (n - K - 1)
            cov = cov + 1e-8 * jnp.eye(d)
            whitens = []
            for b, idxs in enumerate(self._block_indices):
                sub = cov[jnp.ix_(jnp.asarray(idxs), jnp.asarray(idxs))]
                chol = jnp.linalg.cholesky(sub)
                pad = jnp.zeros((d, d))
                pad = pad.at[jnp.ix_(jnp.asarray(idxs),
                                     jnp.asarray(idxs))].set(chol)
                whitens.append(pad)
            whitens = jnp.stack(whitens)
            key, k_pick, k_slice = jax.random.split(key, 3)
            starts = jax.random.choice(k_pick, survive, (K,), replace=True)
            keys = jax.random.split(k_slice, K)
            cache_starts = jax.tree.map(lambda a: a[starts], cache_live)
            # cluster-aware whitening: each chain uses its own cluster's
            # per-block transforms when host clustering is active, else the
            # global live-point covariance (branchless select)
            cid_starts = cluster_ids[starts]
            w_starts = jnp.where(
                use_clusters,
                cluster_whitens[cid_starts],
                jnp.broadcast_to(whitens, (K,) + whitens.shape),
            )
            new_u, new_logL, new_cache, n_ev = jax.vmap(
                replace_one, in_axes=(0, 0, 0, None, 0, 0)
            )(u_live[starts], logL_live[starts], cache_starts, Lmin,
              w_starts, keys)
            u_live = u_live.at[kill].set(new_u)
            logL_live = logL_live.at[kill].set(new_logL)
            cluster_ids = cluster_ids.at[kill].set(cid_starts)
            cache_live = jax.tree.map(
                lambda full, new: full.at[kill].set(new), cache_live,
                new_cache,
            )
            # a stuck chain never moved off its start point (comparing logL
            # to Lmin can't detect this: start points survive above Lmin)
            stuck = jnp.sum(jnp.all(new_u == u_live[starts], axis=-1))
            return (u_live, logL_live, cache_live, key, cluster_ids, dead_u,
                    dead_logL, jnp.sum(n_ev), stuck)

        return generation

    def _init_cache(self, u_live):
        """Per-live-point component cache (empty tuple when ungraded)."""
        import jax
        import jax.numpy as jnp

        if self._full_eval is None:
            return ()
        cube_to_x = self._cube_to_x

        def full(u):
            return self._full_eval(cube_to_x(u))[4]

        from ...ops import hoist as hoist_ops

        return hoist_ops.jit_with_consts(
            jax.vmap(full), self._consts)(u_live)

    # ------------------------------------------------------------------
    def run(self):
        import jax
        import jax.numpy as jnp

        n, K, d = self._nlive, self._batch, self.d
        resumed = self._restore_checkpoint()
        if resumed is not None:
            u_live, logL_live, key = resumed
        else:
            key = self.next_jax_key()
            key, k0 = jax.random.split(key)
            u_live = jax.random.uniform(k0, (n, d), dtype=self._dtype)
        if self._mesh is not None:
            from ...parallel.mesh import chain_sharding

            u_live = jax.device_put(u_live, chain_sharding(self._mesh))
        if resumed is None:
            logL_live = self._loglike_batch(u_live)
            self._n_evals += n
        cache_live = self._init_cache(u_live)
        # cluster-aware evolution state (host recomputed periodically)
        n_blocks = len(self._block_indices)
        maxc = max(int(self.max_clusters), 1)
        cluster_ids = jnp.zeros(n, jnp.int32)
        cluster_whitens = jnp.zeros((maxc, n_blocks, d, d), self._dtype)
        use_clusters = jnp.asarray(False)
        cluster_every = max(int(self.cluster_every), 1)
        self.mpi_info(
            "Nested sampling: nlive=%d, batch=%d, num_repeats=%d (d=%d)",
            n, K, self._num_repeats, d,
        )
        # host-side f64 evidence ledger
        if resumed is not None:
            s = self._resume_state
            dead_u_all = [np.asarray(s["dead_u"])] if len(s["dead_u"]) \
                else []
            dead_logL_all = [np.asarray(s["dead_logL"])] if \
                len(s["dead_logL"]) else []
            dead_logw_all = list(np.asarray(s["dead_logw"]))
            logZ = float(s["logZ"])
            logX = float(s["logX"])
            H = float(s["H"])
            it = int(s["it"])
            self._n_evals = int(s["n_evals"])
            self._resume_state = None
            self.mpi_info(
                "Resumed nested run at generation %d (%d dead points, "
                "logZ so far %.4f).", it, it * K, logZ,
            )
        else:
            dead_u_all, dead_logL_all, dead_logw_all = [], [], []
            logZ = -np.inf
            logX = 0.0
            H = 0.0
            it = 0
        checkpoint_every = max(int(self.checkpoint_every or 0), 0)
        while True:
            it += 1
            (u_live, logL_live, cache_live, key, cluster_ids, dead_u,
             dead_logL, n_ev, stuck) = self._generation(
                u_live, logL_live, cache_live, key, cluster_ids,
                cluster_whitens, use_clusters,
            )
            if self.cluster_evolution and it % cluster_every == 0:
                labels, whitens_h = self._cluster_live_points(
                    np.asarray(jax.device_get(u_live))
                )
                if whitens_h is not None:
                    cluster_ids = jnp.asarray(labels, jnp.int32)
                    pad = np.zeros((maxc, n_blocks, d, d), self._dtype)
                    pad[:whitens_h.shape[0]] = whitens_h
                    cluster_whitens = jnp.asarray(pad)
                    use_clusters = jnp.asarray(True)
                else:
                    use_clusters = jnp.asarray(False)
            dead_u_h, dead_logL_h, logL_live_h, n_ev_h, stuck_h = (
                jax.device_get((dead_u, dead_logL, logL_live, n_ev, stuck))
            )
            self._n_evals += int(n_ev_h)
            # ordered kills: live counts n, n-1, ..., n-K+1
            for j in range(K):
                d_logX = -1.0 / (n - j)
                logw = logX + np.log(-np.expm1(d_logX))  # log(X_i - X_{i+1})
                logX += d_logX
                lw = logw + float(dead_logL_h[j])
                logZ_new = np.logaddexp(logZ, lw)
                if np.isfinite(lw):
                    old_term = (
                        np.exp(logZ - logZ_new) * (H + logZ)
                        if np.isfinite(logZ) else 0.0
                    )
                    H = (
                        np.exp(lw - logZ_new) * float(dead_logL_h[j])
                        + old_term - logZ_new
                    )
                logZ = logZ_new
                dead_logw_all.append(logw)
            dead_u_all.append(dead_u_h)
            dead_logL_all.append(dead_logL_h)
            if checkpoint_every and it % checkpoint_every == 0:
                self._write_checkpoint(
                    u_live, logL_live, key, dead_u_all, dead_logL_all,
                    dead_logw_all, logZ, logX, H, it,
                )
            # stopping: live evidence fraction
            logL_max = float(np.max(logL_live_h))
            live_frac = logL_max + logX - logZ
            if it % 20 == 0 or live_frac < np.log(self.precision_criterion):
                self.mpi_info(
                    "gen %d: ndead=%d logZ=%.4f logX=%.2f live-frac=%.3g "
                    "evals=%d", it, it * K, logZ, logX, np.exp(live_frac),
                    self._n_evals,
                )
            if live_frac < np.log(self.precision_criterion):
                break
            if it * K >= self.max_ndead:
                self.mpi_warning("Stopped at max_ndead without convergence.")
                break
            if stuck_h == K:
                self.mpi_warning(
                    "All slice chains stuck at the constraint; stopping "
                    "early (likelihood plateau?)."
                )
                break
        # record the live-state sharding for introspection/tests
        self._final_live_sharding = getattr(u_live, "sharding", None)
        u_live_h = np.asarray(jax.device_get(u_live))
        if self._nproc > 1:
            self._finalize_multiprocess(
                np.concatenate(dead_u_all), np.concatenate(dead_logL_all),
                u_live_h, logL_live_h, gens=it,
            )
            return
        # final live points: each carries X_final/n
        logw_live = logX - np.log(n)
        live_logL_sorted = np.sort(logL_live_h)
        for lL in live_logL_sorted:
            lw = logw_live + lL
            logZ_new = np.logaddexp(logZ, lw)
            if np.isfinite(lw):
                old_term = (
                    np.exp(logZ - logZ_new) * (H + logZ)
                    if np.isfinite(logZ) else 0.0
                )
                H = np.exp(lw - logZ_new) * lL + old_term - logZ_new
            logZ = logZ_new
        self.logZ = float(logZ)
        self.logZstd = float(np.sqrt(max(H, 0.0) / n))
        self.mpi_info(
            "Evidence: logZ = %.4f +/- %.4f (H=%.3f, %d dead, %d evals)",
            self.logZ, self.logZstd, H, it * K, self._n_evals,
        )
        # --- build the posterior-weighted sample collection -------------------
        dead_u_np = np.concatenate(dead_u_all)
        dead_logL_np = np.concatenate(dead_logL_all)
        dead_logw_np = np.asarray(dead_logw_all)
        all_u = np.concatenate([dead_u_np, u_live_h])
        all_logL = np.concatenate([dead_logL_np, logL_live_h])
        all_logw = np.concatenate([
            dead_logw_np, np.full(n, logw_live)
        ])
        self._build_collection(all_u, all_logL, all_logw)

    # ------------------------------------------------------------------
    # checkpoint / resume (reference capability: PolyChord read_resume,
    # /root/reference/cobaya/samplers/polychord/polychord.py:146-153)
    # ------------------------------------------------------------------
    def _load_checkpoint(self):
        """Stash the saved state at init time (validated in run())."""
        import os

        fn = self.state_filename
        self._resume_state = None
        if fn and os.path.exists(fn):
            with np.load(fn) as data:
                self._resume_state = {k: data[k] for k in data.files}

    def _write_checkpoint(self, u_live, logL_live, key, dead_u_all,
                          dead_logL_all, dead_logw_all, logZ, logX, H, it):
        """Save the full resumable state: live points, RNG, ledger, dead."""
        if not self.output:
            return
        import jax

        from ...parallel import state as pstate

        u_h, logL_h = jax.device_get((u_live, logL_live))
        np.savez(
            self.state_filename,
            u_live=np.asarray(u_h), logL_live=np.asarray(logL_h),
            key=np.asarray(jax.random.key_data(key)),
            dead_u=(np.concatenate(dead_u_all) if dead_u_all
                    else np.zeros((0, self.d))),
            dead_logL=(np.concatenate(dead_logL_all) if dead_logL_all
                       else np.zeros(0)),
            dead_logw=np.asarray(dead_logw_all),
            logZ=logZ, logX=logX, H=H, it=it, n_evals=self._n_evals,
        )
        self.write_checkpoint_info({
            "converged": False,
            "mpi_size": pstate.process_count(),
            "nlive": self._nlive,
            "generations": int(it),
            "ndead": int(it * self._batch),
            "logZ_so_far": float(logZ),
        })

    def _restore_checkpoint(self):
        """Validate + restore live state; None when starting fresh."""
        import jax
        import jax.numpy as jnp

        from ...parallel import state as pstate

        state = getattr(self, "_resume_state", None)
        if state is None:
            return None
        info = self.read_checkpoint_info() or {}
        old_size = info.get("mpi_size")
        if old_size is not None and int(old_size) != \
                pstate.process_count():
            raise LoggedError(
                self.log,
                "Cannot resume: the nested run was checkpointed with %s "
                "process(es), but this launch has %d.",
                old_size, pstate.process_count(),
            )
        if state["u_live"].shape != (self._nlive, self.d):
            raise LoggedError(
                self.log,
                "Cannot resume: stored live points have shape %s, this "
                "configuration needs (%d, %d).",
                state["u_live"].shape, self._nlive, self.d,
            )
        u_live = jnp.asarray(state["u_live"], self._dtype)
        logL_live = jnp.asarray(state["logL_live"], self._dtype)
        key = jax.random.wrap_key_data(jnp.asarray(state["key"]))
        return u_live, logL_live, key

    @classmethod
    def output_files_regexps(cls, output, info=None, minimal=False):
        import re

        regexps = [output.collection_regexp()]
        if not minimal:
            regexps.append(re.compile(
                re.escape(output.prefix) + r"\.nested(\.\d+)?\."
                r"(checkpoint|state\.npz|logZ|clusters.*)$"
            ))
        return regexps

    def _decorate(self, all_u):
        """One batched call: x, per-prior logps, per-like logps, derived."""
        import jax
        import jax.numpy as jnp

        _, (x, logpriors, loglikes, derived) = jax.device_get(
            self._decorate_batch(jnp.asarray(all_u, self._dtype))
        )
        return (np.asarray(x), np.asarray(logpriors),
                np.asarray(loglikes), np.asarray(derived))

    def _build_collection(self, all_u, all_logL, all_logw,
                          write_output: bool = True, decorated=None):
        """Store the weighted dead+live sample (optionally pre-decorated)."""
        post_logw = all_logw + all_logL - self.logZ
        weights = np.exp(post_logw - post_logw.max())
        x, logpriors, loglikes, derived = (
            decorated if decorated is not None else self._decorate(all_u)
        )
        output = self.output if write_output else None
        self.collection = SampleCollection(self.model, output, name="1")
        # all_logL is the EFFECTIVE likelihood (external priors folded in):
        # logpost = all_logL + internal prior; the per-prior columns carry
        # the full [internal, external...] split
        self.collection.append_batch(
            x, np.asarray(all_logL) + logpriors[:, 0],
            logpriors, loglikes, derived,
            weights=weights, rle=False,
        )
        self.collection.out_update()
        if output:
            with open(output.add_suffix(
                self.get_name() + cv.Extension.evidence, separator="."
            ), "w", encoding="utf-8") as f:
                f.write(f"logZ = {self.logZ:.6f} +/- {self.logZstd:.6f}\n")

    def _finalize_multiprocess(self, dead_u, dead_logL, u_live_h,
                               logL_live_h, gens: int):
        """Merge the per-process runs into one combined nested run.

        Every process contributes its (ascending-logL) death sequence with
        per-point live counts, plus its final live points treated as
        terminal deaths with counts n..1.  The merged sequence shrinks the
        prior volume by 1/N at each death, where N is the summed current
        live count over the runs — the standard combination of independent
        nested runs, statistically equivalent to one run with the total
        number of live points (Skilling 2006 §7).  Root computes the
        merged ledger and writes products; all ranks hold the identical
        merged sample.
        """
        from ...parallel import state as pstate

        n = self._nlive
        K = self._batch
        order = np.argsort(logL_live_h)
        ev_logL = np.concatenate([dead_logL, logL_live_h[order]])
        # live count just before each death: n, n-1, ... n-K+1 per
        # generation, then n..1 over the terminal live points
        ev_c = np.concatenate([
            np.tile(np.arange(n, n - K, -1), gens),
            np.arange(n, 0, -1),
        ]).astype(np.int64)
        ev_u = np.concatenate([dead_u, u_live_h[order]])
        payload = {"logL": np.asarray(ev_logL, np.float64), "c": ev_c,
                   "u": np.asarray(ev_u), "evals": int(self._n_evals)}
        # The per-rank runs are fully unsynchronized and their termination
        # iteration is stochastic, so rank finish-time skew is unbounded:
        # align with a counter-free long barrier before exchanging, and use
        # long timeouts for the merge itself (root's heap merge + batched
        # decoration of the full merged set can take minutes).
        pstate.sync_point("nested-finalize", timeout_ms=86_400_000)
        merge_timeout_ms = 3_600_000
        gathered = pstate.gather(payload, tag="nested-merge",
                                 timeout_ms=merge_timeout_ms)
        if pstate.is_main_process():
            merged = self._merge_runs(gathered)
            pstate.share(merged, tag="nested-merged",
                         timeout_ms=merge_timeout_ms)
        else:
            merged = pstate.share(None, tag="nested-merged",
                                  timeout_ms=merge_timeout_ms)
        self.logZ = merged["logZ"]
        self.logZstd = merged["logZstd"]
        self._n_evals = merged["evals"]
        self.mpi_info(
            "Merged evidence over %d processes: logZ = %.4f +/- %.4f "
            "(%d points, %d evals)", self._nproc, self.logZ, self.logZstd,
            len(merged["logL"]), self._n_evals,
        )
        # decorate once on root and share: every rank holds the identical
        # merged sample without re-evaluating the whole merged set P times
        if pstate.is_main_process():
            decorated = self._decorate(merged["u"])
            pstate.share(decorated, tag="nested-decorated",
                         timeout_ms=merge_timeout_ms)
        else:
            decorated = pstate.share(None, tag="nested-decorated",
                                     timeout_ms=merge_timeout_ms)
        self._build_collection(
            merged["u"], merged["logL"], merged["logw"],
            write_output=pstate.is_main_process(), decorated=decorated,
        )

    @staticmethod
    def _merge_runs(gathered):
        """Combined evidence ledger over independent runs (root only)."""
        import heapq

        runs_logL = [g["logL"] for g in gathered]
        runs_c = [g["c"] for g in gathered]
        R = len(gathered)
        ptr = [0] * R
        out_logw = [np.full(len(L), -np.inf) for L in runs_logL]
        logX, logZ, H = 0.0, -np.inf, 0.0
        heap = [(runs_logL[r][0], r) for r in range(R) if len(runs_logL[r])]
        heapq.heapify(heap)
        while heap:
            logL, r = heapq.heappop(heap)
            N = sum(
                int(runs_c[q][ptr[q]]) for q in range(R)
                if ptr[q] < len(runs_c[q])
            )
            d_logX = -1.0 / N
            logw = logX + np.log(-np.expm1(d_logX))
            logX += d_logX
            lw = logw + logL
            logZ_new = np.logaddexp(logZ, lw)
            if np.isfinite(lw):
                old_term = (
                    np.exp(logZ - logZ_new) * (H + logZ)
                    if np.isfinite(logZ) else 0.0
                )
                H = np.exp(lw - logZ_new) * float(logL) + old_term - logZ_new
            logZ = logZ_new
            out_logw[r][ptr[r]] = logw
            ptr[r] += 1
            if ptr[r] < len(runs_logL[r]):
                heapq.heappush(heap, (runs_logL[r][ptr[r]], r))
        n_total = sum(int(c[0]) for c in runs_c if len(c))
        return {
            "u": np.concatenate([g["u"] for g in gathered]),
            "logL": np.concatenate(runs_logL),
            "logw": np.concatenate(out_logw),
            "logZ": float(logZ),
            "logZstd": float(np.sqrt(max(H, 0.0) / max(n_total, 1))),
            "evals": sum(int(g["evals"]) for g in gathered),
        }

    def _cluster_live_points(self, u: np.ndarray):
        """FoF-cluster the live points; return per-point labels and the
        per-cluster per-block whitening transforms, or (None, None) when a
        single cluster suffices.

        PolyChord's cluster-aware evolution equivalent: slice chains whiten
        with their own mode's covariance so step sizes stay local.
        """
        n, d = u.shape
        mu = u.mean(0)
        dx = u - mu
        cov = dx.T @ dx / max(n - 1, 1) + 1e-10 * np.eye(d)
        try:
            white = dx @ np.linalg.inv(np.linalg.cholesky(cov)).T
        except np.linalg.LinAlgError:
            white = dx
        link = float(getattr(self, "cluster_linking_scale", 0.5) or 0.5)
        # FoF union-find on the (small) live set
        parent = np.arange(n)

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        d2 = ((white[:, None, :] - white[None, :, :]) ** 2).sum(-1)
        for i, j in np.argwhere((d2 < (link * 2) ** 2) & (d2 > 0)):
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[rj] = ri
        labels = np.unique([find(i) for i in range(n)],
                           return_inverse=True)[1]
        k = labels.max() + 1
        if k <= 1:
            return None, None
        # merge clusters too small to define a covariance into the nearest
        min_pts = max(d + 2, 5)
        sizes = np.bincount(labels, minlength=k)
        big = np.flatnonzero(sizes >= min_pts)
        if len(big) <= 1:
            return None, None
        if len(big) > int(self.max_clusters):
            big = big[np.argsort(sizes[big])[::-1][:int(self.max_clusters)]]
        centers = np.stack([white[labels == j].mean(0) for j in big])
        dists = ((white[:, None, :] - centers[None]) ** 2).sum(-1)
        labels = np.argmin(dists, axis=1)  # 0..len(big)-1
        # per-cluster per-block padded cholesky transforms
        n_blocks = len(self._block_indices)
        whitens = np.zeros((len(big), n_blocks, d, d))
        for c in range(len(big)):
            members = u[labels == c]
            mu_c = members.mean(0)
            cov_c = ((members - mu_c).T @ (members - mu_c)
                     / max(len(members) - 1, 1)) + 1e-8 * np.eye(d)
            for b, idxs in enumerate(self._block_indices):
                idxs = np.asarray(idxs)
                sub = cov_c[np.ix_(idxs, idxs)]
                try:
                    chol = np.linalg.cholesky(sub)
                except np.linalg.LinAlgError:
                    chol = np.diag(np.sqrt(np.diag(sub)))
                whitens[c, b][np.ix_(idxs, idxs)] = chol
        self.mpi_info("Live-point clustering: %d modes (sizes %s).",
                      len(big), np.bincount(labels).tolist())
        return labels, whitens.astype(self.precision)

    def _compute_clusters(self):
        """Posterior-sample clustering with per-cluster evidences.

        The reference gets clusters from PolyChord's internal clustering;
        here the final weighted posterior samples are decomposed with
        BIC-selected k-means (whitened coordinates), and each cluster k
        reports ``logZ_k = logZ + log(w_k)`` with ``w_k`` its posterior
        mass fraction.  (Cluster-aware *sampling* — separate live-point
        evolution per mode — is tracked for a later round.)
        """
        coll = self.collection
        x_all = coll.sampled_values()
        w_all = coll.weights / coll.weights.sum()
        # cluster only posterior-significant samples (the early prior-phase
        # dead points carry ~zero weight and would seed spurious clusters)
        keep = w_all > w_all.max() * 1e-3
        x, w = x_all[keep], w_all[keep]
        w = w / w.sum()
        mu = np.average(x, weights=w, axis=0)
        dx = x - mu
        cov = np.einsum("n,ni,nj->ij", w, dx, dx)
        try:
            white = dx @ np.linalg.inv(np.linalg.cholesky(cov)).T
        except np.linalg.LinAlgError:
            white = dx
        n, d = white.shape
        # friends-of-friends linking in whitened coordinates (deterministic;
        # the standard mode identifier for nested-sampling posteriors)
        link = float(getattr(self, "cluster_linking_scale", 0.5) or 0.5)
        # subsample for the O(n^2) linking if needed, assign the rest after
        max_link_points = 3000
        if n > max_link_points:
            idx = np.argsort(w)[::-1][:max_link_points]
        else:
            idx = np.arange(n)
        pts = white[idx]
        m = len(pts)
        parent = np.arange(m)

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        pairs = np.argwhere((d2 < link**2) & (d2 > 0))
        for i, j in pairs:
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[rj] = ri
        roots = np.array([find(i) for i in range(m)])
        labels_sub = np.unique(roots, return_inverse=True)[1]
        # assign every point (incl. unsubsampled) to the nearest component
        k = labels_sub.max() + 1
        centers = np.stack([
            np.average(pts[labels_sub == j], axis=0,
                       weights=w[idx][labels_sub == j])
            for j in range(k)
        ])
        dists = ((white[:, None, :] - centers[None]) ** 2).sum(-1)
        labels = np.argmin(dists, axis=1)
        # drop negligible components (< 0.5% posterior mass) into neighbors
        masses = np.array([w[labels == j].sum() for j in range(k)])
        significant = masses > 0.005
        if significant.sum() >= 1 and not significant.all():
            big_centers = centers[significant]
            remap = np.flatnonzero(significant)
            dists = ((white[:, None, :] - big_centers[None]) ** 2).sum(-1)
            labels = remap[np.argmin(dists, axis=1)]
        clusters = {}
        out_index = 0
        for j in np.unique(labels):
            mask = labels == j
            out_index += 1
            full_mask = np.zeros(len(x_all), dtype=bool)
            full_mask[keep] = mask
            sub = coll.filtered_copy(full_mask)
            mass = float(w[mask].sum())
            clusters[out_index] = {
                "sample": sub,
                "logZ": self.logZ + float(np.log(max(mass, 1e-300))),
                "logZstd": self.logZstd,
                "mass_fraction": mass,
            }
        return clusters

    def products(self, **kwargs):
        do_clustering = bool(getattr(self, "do_clustering", True))
        clusters = self._compute_clusters() if (
            do_clustering and len(self.collection) > 40
        ) else None
        return {
            "sample": self.collection,
            "logZ": self.logZ,
            "logZstd": self.logZstd,
            "clusters": clusters,
        }
