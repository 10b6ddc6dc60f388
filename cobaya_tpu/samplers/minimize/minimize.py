"""Posterior maximization (MAP) / likelihood maximization.

Capability parity with /root/reference/cobaya/samplers/minimize/minimize.py:
minimizes -logposterior (or -loglike with ``ignore_prior``) with affine
rescaling by conditional widths ``1/sqrt(diag(inv(cov)))``, multiple
independent starts with the best result kept, starting from a previous
chain's MAP/best-fit when resuming over existing output, and dual-format
results (``.minimum.txt`` cobaya format + ``.minimum`` getdist format).

TPU-first: for jit-compiled models the minimizer is gradient-based L-BFGS
(the posterior is differentiable end-to-end — something the reference's
derivative-free BOBYQA cannot exploit), with ALL ``best_of`` starts batched in
one vmapped jitted optimization.  Models with host-callback components fall
back to scipy's derivative-free methods.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

from ...io.collection import SampleCollection
from ...utils.log import LoggedError
from ...utils.tools import read_dnumber
from ..sampler import CovmatSampler


class Minimize(CovmatSampler):
    file_base_name = "minimize"

    method: str
    ignore_prior: bool
    max_evals: Union[int, str, float]
    best_of: int
    confidence_for_unbounded: float
    override_scipy: Optional[dict]
    override_bobyqa: Optional[dict]
    override_iminuit: Optional[dict]

    _is_minimizer = True

    def initialize(self):
        self.d = len(self.model.parameterization.sampled_params())
        self._max_evals = read_dnumber(self.max_evals, self.d)
        self.mpi_info(
            "Minimizing -log(%s) with %d starts.",
            "likelihood" if self.ignore_prior else "posterior", self.best_of,
        )
        self._bounds = self.model.prior.bounds(
            confidence_for_unbounded=self.confidence_for_unbounded
        )
        covmat = self.initial_proposal_covmat()
        # affine rescaling: conditional widths, clipped to bounds/3
        try:
            widths = 1 / np.sqrt(np.diag(np.linalg.inv(covmat)))
        except np.linalg.LinAlgError:
            widths = np.sqrt(np.diag(covmat))
        span = self._bounds[:, 1] - self._bounds[:, 0]
        finite = np.isfinite(span)
        widths[finite] = np.minimum(widths[finite], span[finite] / 3)
        self._scales = widths
        self._jittable = all(
            getattr(c, "jittable", False) for c in self.model.components
        )
        method = self.method
        if method == "auto":
            method = "lbfgs" if self._jittable else "scipy"
        if method in ("bobyqa", "iminuit"):
            # reference method names: use the external optimizer when it is
            # installed, otherwise the scipy derivative-free path
            module = {"bobyqa": "pybobyqa", "iminuit": "iminuit"}[method]
            try:
                __import__(module)
                self._external_optimizer = method
            except ImportError:
                self.mpi_warning(
                    "'%s' requested but %s is not installed; using the "
                    "scipy fallback.", method, module,
                )
                self._external_optimizer = None
            method = "scipy"
        else:
            self._external_optimizer = None
        self._method = method
        self.result = None
        self.minimum: Optional[SampleCollection] = None
        self._full_sets = None

    # ------------------------------------------------------------------
    def _starting_points(self) -> np.ndarray:
        """best_of starting points: previous MAP if available, then refs."""
        points = []
        if self.output and self.output.find_collections():
            try:
                from ...io.output import load_samples

                prev = load_samples(
                    self.output.add_suffix("", separator=""), combined=True
                )
                row = prev.MAP() if not self.ignore_prior else prev.bestfit()
                points.append(row[2:2 + self.d])
                self.mpi_info("Starting first run from previous chain MAP.")
            except Exception:
                pass
        while len(points) < self.best_of:
            try:
                point, _ = self.model.get_valid_point(
                    max_tries=1000, ignore_fixed_ref=(len(points) > 0),
                    random_state=self.rng,
                )
            except LoggedError:
                point = self.model.prior.reference(
                    warn_if_no_ref=False, random_state=self.rng
                )
            points.append(np.asarray(point, float))
        return np.stack(points[: self.best_of])

    def run(self):
        x0 = self._starting_points()
        if self._method == "lbfgs":
            xs, fs, n_evals = self._run_lbfgs_batched(x0)
        else:
            xs, fs, n_evals = self._run_scipy(x0)
        # multi-process runs pool every process's starts and all ranks
        # keep the global best (reference minimize.py:371-430 zip_gather +
        # process_results)
        from ...parallel import state as pstate

        if pstate.more_than_one_process():
            # per-rank minimizations are unsynchronized and can finish
            # minutes apart; align with a counter-free barrier before the
            # exchange and give the gather itself a long timeout, so a
            # slow rank doesn't blow the fast ranks' blocking reads
            pstate.sync_point("minimize-finalize", timeout_ms=86_400_000)
            per_proc = pstate.allgather(
                {"xs": np.asarray(xs), "fs": np.asarray(fs)},
                tag="minimize-results", timeout_ms=3_600_000,
            )
            xs = np.concatenate([p["xs"] for p in per_proc], axis=0)
            fs = np.concatenate([p["fs"] for p in per_proc], axis=0)
        i_best = int(np.argmin(fs))
        self._full_sets = (xs, fs)
        spread = np.max(fs) - np.min(fs)
        if spread > 0.01 and len(fs) > 1:
            self.mpi_warning(
                "Minima from different starts spread by %.4g in -logp "
                "(worst %.6g, best %.6g); the posterior may be multimodal.",
                spread, np.max(fs), np.min(fs),
            )
        x_best = xs[i_best]
        results = self.model.logposterior(x_best)
        self.result = {
            "success": bool(np.isfinite(fs[i_best])),
            "x": x_best,
            "fun": float(fs[i_best]),
            "n_evals": int(n_evals),
            "all_f": fs.tolist(),
        }
        self.minimum = SampleCollection(self.model, self.output,
                                        name="minimum", extension="txt")
        self.minimum._file_name = (
            self.output.add_suffix("minimum.txt", separator=".")
            if self.output else None
        )
        self.minimum.add(
            x_best, derived=results.derived, weight=1,
            logpriors=results.logpriors, loglikes=results.loglikes,
            logpost=results.logpost,
        )
        self.mpi_info(
            "Minimization complete: -log%s = %.6g at %s",
            "like" if self.ignore_prior else "post", fs[i_best],
            dict(zip(self.model.parameterization.sampled_params(),
                     np.round(x_best, 6))),
        )
        self._write_results()

    # ------------------------------------------------------------------
    def _objective_jax(self):
        import jax.numpy as jnp

        fn = self.model.make_logposterior_fn()
        lo = jnp.asarray(np.where(np.isfinite(self._bounds[:, 0]),
                                  self._bounds[:, 0], -1e30), jnp.float32)
        hi = jnp.asarray(np.where(np.isfinite(self._bounds[:, 1]),
                                  self._bounds[:, 1], 1e30), jnp.float32)
        scales = jnp.asarray(self._scales, jnp.float32)
        ignore_prior = self.ignore_prior

        def objective(y, x_ref):
            # y: scaled offset coordinates; soft clip into bounds
            x = x_ref + scales * y
            x_c = jnp.clip(x, lo, hi)
            logpost, logpriors, loglikes, _ = fn(x_c)
            val = jnp.sum(loglikes) if ignore_prior else (
                jnp.sum(loglikes) + jnp.sum(logpriors)
            )
            # quadratic penalty for leaving the box keeps gradients informative
            penalty = jnp.sum(((x - x_c) / scales) ** 2)
            return -val + 1e3 * penalty

        return objective

    def _run_lbfgs_batched(self, x0: np.ndarray):
        import jax
        import jax.numpy as jnp
        import optax

        objective = self._objective_jax()
        max_iters = min(int(self._max_evals), 500)

        def solve_one(x_start):
            fun = lambda y: objective(y, x_start)
            opt = optax.lbfgs()
            value_and_grad = optax.value_and_grad_from_state(fun)

            def cond(carry):
                y, state, it = carry
                grad = optax.tree.get(state, "grad")
                return (it < max_iters) & (
                    jnp.linalg.norm(grad) > 1e-7
                )

            def step(carry):
                y, state, it = carry
                value, grad = value_and_grad(y, state=state)
                updates, state = opt.update(
                    grad, state, y, value=value, grad=grad, value_fn=fun
                )
                y = optax.apply_updates(y, updates)
                return y, state, it + 1

            y0 = jnp.zeros(self.d, jnp.float32)
            state0 = opt.init(y0)
            y, state, it = jax.lax.while_loop(cond, step, (y0, state0, 0))
            x = x_start + jnp.asarray(self._scales, jnp.float32) * y
            return x, fun(y), it

        x0j = jnp.asarray(x0, jnp.float32)
        self._mesh = None
        if jax.local_device_count() > 1:
            # shard the independent starts over the device mesh (pad by
            # cycling starts so the batch divides evenly; extra duplicates
            # are harmless — the best minimum wins)
            from ...parallel.mesh import (
                chain_sharding,
                make_mesh,
                round_up_chains,
            )

            self._mesh = make_mesh()
            ndev = int(np.prod(self._mesh.devices.shape))
            n_pad = round_up_chains(len(x0), ndev)
            if n_pad > len(x0):
                reps = np.resize(np.arange(len(x0)), n_pad)
                x0j = x0j[jnp.asarray(reps)]
            x0j = jax.device_put(x0j, chain_sharding(self._mesh))
        from ...ops import hoist as hoist_ops

        consts = hoist_ops.device_consts(hoist_ops.collect(
            self.model.make_logposterior_fn(), np.zeros(self.d)))
        xs, fs, nits = hoist_ops.jit_with_consts(
            jax.vmap(solve_one), consts)(x0j)
        self._starts_sharding = getattr(xs, "sharding", None)
        # polish the best candidates at f64 precision on host
        xs, fs = np.asarray(xs, float), np.asarray(fs, float)
        xs2, fs2, n2 = self._run_scipy(xs, polish=True)
        better = fs2 < fs
        xs[better], fs[better] = xs2[better], fs2[better]
        return xs, fs, int(np.sum(np.asarray(nits))) + n2

    def _run_scipy(self, x0: np.ndarray, polish: bool = False):
        from scipy import optimize

        logp = self.model.make_logposterior_fn()
        ignore_prior = self.ignore_prior

        def objective(x):
            logpost, logpriors, loglikes, _ = logp(x.astype(np.float32))
            val = float(np.sum(loglikes)) if ignore_prior else float(
                np.sum(loglikes) + np.sum(np.asarray(logpriors))
            )
            return -val if np.isfinite(val) else 1e30

        bounds = [
            (lo if np.isfinite(lo) else None, hi if np.isfinite(hi) else None)
            for lo, hi in self._bounds
        ]
        if getattr(self, "_external_optimizer", None) == "bobyqa":
            return self._run_bobyqa(objective, x0)
        if getattr(self, "_external_optimizer", None) == "iminuit":
            return self._run_iminuit(objective, x0, bounds)
        kwargs = {"method": "Nelder-Mead"} if not polish else {
            "method": "Nelder-Mead",
            "options": {"xatol": 1e-8, "fatol": 1e-10},
        }
        kwargs.update(self.override_scipy or {})
        xs, fs, n = [], [], 0
        for start in x0:
            res = optimize.minimize(
                objective, np.asarray(start, float),
                bounds=bounds if kwargs.get("method") in (
                    "L-BFGS-B", "Powell", "TNC", "SLSQP") else None,
                **kwargs,
            )
            xs.append(res.x)
            fs.append(res.fun)
            n += int(res.get("nfev", 0))
        return np.stack(xs), np.asarray(fs), n

    def _run_bobyqa(self, objective, x0):
        """py-bobyqa backend (reference minimize.py bobyqa method)."""
        import pybobyqa

        lo = np.where(np.isfinite(self._bounds[:, 0]), self._bounds[:, 0],
                      -1e30)
        hi = np.where(np.isfinite(self._bounds[:, 1]), self._bounds[:, 1],
                      1e30)
        kwargs = {
            "bounds": (lo, hi), "seek_global_minimum": True,
            "objfun_has_noise": False,
            "maxfun": int(self._max_evals),
        }
        kwargs.update(getattr(self, "override_bobyqa", None) or {})
        xs, fs, n = [], [], 0
        for start in x0:
            res = pybobyqa.solve(objective, np.asarray(start, float),
                                 **kwargs)
            xs.append(res.x)
            fs.append(res.f)
            n += int(res.nf)
        return np.stack(xs), np.asarray(fs), n

    def _run_iminuit(self, objective, x0, bounds):
        """iminuit backend (reference minimize.py iminuit method)."""
        from iminuit import minimize as iminuit_minimize

        kwargs = {"bounds": bounds}
        kwargs.update(getattr(self, "override_iminuit", None) or {})
        xs, fs, n = [], [], 0
        for start in x0:
            res = iminuit_minimize(objective, np.asarray(start, float),
                                   **kwargs)
            xs.append(res.x)
            fs.append(res.fun)
            n += int(getattr(res, "nfev", 0))
        return np.stack(xs), np.asarray(fs), n

    # ------------------------------------------------------------------
    def _write_results(self):
        if not self.output:
            return
        self.minimum.out_update()
        # getdist-format .minimum file
        fn = self.output.add_suffix("minimum", separator=".")
        row = self.minimum.data[0]
        labels = self.model.parameterization.labels()
        with open(fn, "w", encoding="utf-8") as f:
            f.write(f"-log(Like) = {row[1]:.6f}\n\n")
            names = (self.minimum.sampled_params
                     + self.minimum.derived_params)
            for i, p in enumerate(names):
                f.write(f"{i + 1:5d} {row[2 + i]:17.8e}   {p}   "
                        f"{labels.get(p, p)}\n")

    def products(self, **kwargs):
        return {
            "minimum": self.minimum,
            "result_object": self.result,
            "full_set_of_mins": self._full_sets,
        }
