"""Hamiltonian Monte Carlo sampler (vmapped walkers).

Not present in the reference — a TPU-native addition made possible because
this framework's posteriors are differentiable end-to-end
(Model.make_logposterior_fn is grad-safe).  Reuses the adaptive MCMC
infrastructure wholesale: the learned covariance becomes the HMC mass
matrix, R-1 convergence and checkpointing are inherited, and the step size
adapts between epochs toward ``target_accept``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ...ops.hmc import make_hmc_epoch_fn
from ...utils.log import LoggedError
from ..mcmc.mcmc import MCMC


class HMC(MCMC):
    file_base_name = "hmc"

    leapfrog_steps: int
    step_size: Optional[float]
    adapt_step_size: bool
    target_accept: float

    @classmethod
    def get_defaults(cls, return_yaml=False, yaml_expand_defaults=True,
                     input_options=None):
        # merge the MCMC defaults under the HMC-specific ones
        defaults = MCMC.get_defaults(
            return_yaml=return_yaml, input_options=input_options
        )
        if return_yaml:
            return defaults
        from ...utils.tools import recursive_update
        from ...utils.yamlio import yaml_load_file

        own = yaml_load_file(cls.get_root_file_name() + ".yaml")
        return recursive_update(defaults, own or {})

    def initialize(self):
        if not all(getattr(c, "jittable", False)
                   for c in self.model.components):
            raise LoggedError(
                self.log,
                "HMC needs a fully jit-compiled (differentiable) model; use "
                "'mcmc' for models with host-callback components.",
            )
        self.drag = False
        super().initialize()
        self._eps = float(self.step_size or 0.2)
        self._pack_hmc_args()

    def _init_points(self):
        """Start all walkers near the best initial draw (Stan-style warmup):
        far-tail prior draws make fixed-length leapfrog trajectories
        reject indefinitely; burn-in + the skipped record half absorb the
        clustering bias."""
        super()._init_points()
        import jax
        import jax.numpy as jnp

        widths = np.sqrt(np.diag(self._proposal.covmat))

        # single fused device call (eager dispatch is ~1s/op on the
        # tunnel-TPU backend)
        G = getattr(self, "_r_groups", 0)

        @jax.jit
        def cluster_starts(carry_x, carry_logpost, key):
            best = jnp.argmax(carry_logpost)
            shape = (G, carry_x.shape[1]) if G else carry_x.shape
            jitter = 0.01 * jnp.asarray(widths, self._dtype) * \
                jax.random.normal(key, shape, dtype=self._dtype)
            if G:
                # nested R-hat needs one shared start per superchain
                # (see MCMC._init_points)
                jitter = jnp.repeat(jitter, carry_x.shape[0] // G, axis=0)
            return carry_x[best][None, :] + jitter

        x0 = cluster_starts(self._carry.x, self._carry.logpost,
                            self.next_jax_key())
        self._carry = self._shard(
            self._jit_init_carry(self.next_jax_key(), x0))

    def _build_epoch_fn(self, wrap, blocks):
        from ...ops import hoist as hoist_ops

        self._built_record_keep = self._record_keep
        self._epoch_fn = hoist_ops.jit_with_consts(make_hmc_epoch_fn(
            self._logpost_fn, wrap, self.temperature,
            n_leapfrog=int(self.leapfrog_steps),
            record_keep=self._record_keep,
            full_x_records=bool(self.cl_bounds_records),
        ), self._consts)

    def _pack_hmc_args(self):
        import jax.numpy as jnp

        mass_chol = np.linalg.cholesky(self._proposal.covmat)
        self._prop_dev = (
            jnp.asarray(mass_chol, self._dtype),
            jnp.asarray(self._eps, self._dtype),
        )

    def _set_proposal(self, covmat):
        super()._set_proposal(covmat)
        # the learned covariance is the mass matrix; eps is expressed in
        # whitened units, so it carries over across mass updates
        if hasattr(self, "_eps"):
            self._pack_hmc_args()

    def _check_convergence_and_learn_proposal(self):
        # the mass matrix uses the TOTAL pooled covariance (between +
        # within walkers): robust while walkers are still dispersed, and it
        # converges to the posterior covariance as R-1 -> 0
        if hasattr(self, "_last_stats"):
            self._last_stats = dict(
                self._last_stats,
                mean_of_covs=(self._last_stats["mean_of_covs"]
                              + self._last_stats["cov_of_means"]),
            )
        super()._check_convergence_and_learn_proposal()
        if self.adapt_step_size and not self.converged:
            if self._acceptance_rate < 0.1:
                # rescue mode: the mass matrix is likely a bad initial guess
                # (e.g. prior-width fallback); shrink hard so walkers start
                # moving and the covariance can be learned
                self._eps = max(self._eps * 0.3, 1e-4)
            elif self._acceptance_rate > 0.95:
                # far too conservative (e.g. after a mass-matrix update):
                # grow multiplicatively
                self._eps = min(self._eps * 1.6, 2.0)
            else:
                # Robbins-Monro on log(eps) toward the target acceptance
                lr = 0.2
                self._eps = float(np.clip(
                    np.exp(np.log(self._eps) + lr * (
                        self._acceptance_rate - self.target_accept
                    )),
                    1e-4, 2.0,
                ))
            self._pack_hmc_args()
