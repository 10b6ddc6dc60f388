"""Gaussian-mixture analytic likelihood (jittable).

Capability parity with
/root/reference/cobaya/likelihoods/gaussian_mixture/gaussian_mixture.py:
multi-modal Gaussian log-likelihood with optional standardized-residual
derived parameters, plus the random-model generators used throughout the test
suite (``random_mean``, ``random_cov``, ``info_random_gaussian_mixture``).

TPU-first: the log-density is computed in jnp from precomputed inverse
Cholesky factors (one fused matvec per mode), so it traces into the sampler's
jitted step and vectorizes over walker batches.
"""

from __future__ import annotations

import time
from typing import Sequence, Union

import numpy as np

from ...models.likelihood import Likelihood
from ...utils.log import LoggedError
from ...utils.tools import inverse_cholesky

derived_suffix = "_derived"


class GaussianMixture(Likelihood):
    """Gaussian mixture likelihood, normalized."""

    file_base_name = "gaussian_mixture"

    # options (defaults in gaussian_mixture.yaml)
    means: Union[Sequence, np.ndarray, None]
    covs: Union[Sequence, np.ndarray, None]
    weights: Union[np.ndarray, float, None]
    derived: bool
    input_params_prefix: str
    output_params_prefix: str
    delay: float

    def d(self) -> int:
        return len(self.input_params)

    def initialize_with_params(self):
        if self.means is None or self.covs is None:
            raise LoggedError(
                self.log,
                "Must specify both means and covs (or lists of them).",
            )
        means = np.atleast_2d(np.asarray(self.means, dtype=float))
        covs = np.asarray(self.covs, dtype=float)
        if covs.ndim < 3:
            covs = covs.reshape((1,) + covs.shape[-2:]) if covs.ndim == 2 \
                else np.atleast_2d(covs)[None]
        if covs.shape[-1] != covs.shape[-2]:
            raise LoggedError(self.log, "Covariance matrices are not square.")
        if means.shape[1] != covs.shape[-1]:
            raise LoggedError(
                self.log, "Dimensionality of means and covs do not match."
            )
        if means.shape[0] != covs.shape[0]:
            raise LoggedError(
                self.log, "Number of modes of means and covs do not match."
            )
        if means.shape[1] != self.d():
            raise LoggedError(
                self.log,
                "Dimensionality is %d (from means/covs) but %d input params "
                "were assigned.%s",
                means.shape[1], self.d(),
                " Maybe you forgot 'input_params_prefix'?"
                if not self.input_params_prefix else "",
            )
        self.n_modes = means.shape[0]
        if self.derived and len(self.output_params) != self.d() * self.n_modes:
            raise LoggedError(
                self.log,
                "Expected %d derived params (d x n_modes), got %d.",
                self.d() * self.n_modes, len(self.output_params),
            )
        if not self.derived and self.output_params:
            raise LoggedError(
                self.log,
                "Derived params requested but 'derived' option is False.",
            )
        self._means = means
        self._covs = covs
        if self.weights:
            w = np.atleast_1d(np.asarray(self.weights, dtype=float))
            if len(w) != self.n_modes:
                raise LoggedError(
                    self.log, "Need as many weights as modes (%d).", self.n_modes
                )
            if not np.isclose(w.sum(), 1):
                w = w / w.sum()
                self.log.warning("Weights renormalized to %r", w.tolist())
            self._weights = w
        else:
            self._weights = np.full(self.n_modes, 1.0 / self.n_modes)
        # per-mode inverse Cholesky and log-normalization
        self._invL = np.stack([inverse_cholesky(c) for c in covs])
        sign, logdet = zip(*(np.linalg.slogdet(c) for c in covs))
        if not all(s > 0 for s in sign):
            raise LoggedError(self.log, "Covariance matrices not posdef.")
        self._lognorm = -0.5 * (
            self.d() * np.log(2 * np.pi) + np.asarray(logdet)
        )

    def logp_jax(self, params, provider_products=None):
        import jax.numpy as jnp
        from jax.scipy.special import logsumexp

        if self.delay:
            time.sleep(self.delay)
        x = jnp.stack([jnp.asarray(params[p]) for p in self.input_params])
        dtype = x.dtype
        diffs = x[None, :] - self.hoist("means", self._means).astype(dtype)  # (modes, d)
        # standardized residuals per mode: invL @ diff
        standard = jnp.einsum(
            "mij,mj->mi", self.hoist("invL", self._invL).astype(dtype), diffs
        )
        per_mode = self.hoist("lognorm", self._lognorm).astype(dtype) - 0.5 * jnp.sum(
            standard * standard, axis=-1
        )
        if self.n_modes == 1:
            logp = per_mode[0]
        else:
            logp = logsumexp(per_mode, b=self.hoist("weights", self._weights).astype(dtype))
        derived = {}
        if self.derived:
            flat = standard.reshape(-1)
            derived = dict(zip(self.output_params, flat))
        return logp, derived


# ---------------------------------------------------------------------------
# random-model generators (test fixtures; reference gaussian_mixture.py:168)
# ---------------------------------------------------------------------------
def random_mean(ranges, n_modes: int = 1, random_state=None):
    """Uniform random point(s) within the given per-dimension ranges."""
    rng = np.random.default_rng(random_state)
    pts = np.array([
        rng.uniform(r[0], r[1], size=n_modes) for r in ranges
    ]).T
    return pts[0] if n_modes == 1 else pts


def random_cov(ranges, O_std_min=1e-2, O_std_max=1, n_modes: int = 1,
               random_state=None):
    """Random covariance(s): log-uniform stds relative to the ranges, random
    correlations from a Haar-random orthogonal rotation of random eigenvalues."""
    rng = np.random.default_rng(random_state)
    dim = len(ranges)
    scales = np.array([r[1] - r[0] for r in ranges])
    covs = []
    for _ in range(n_modes):
        stds = scales * 10 ** rng.uniform(
            np.log10(O_std_min), np.log10(O_std_max), size=dim
        )
        if dim > 1:
            # random correlation: normalized random-eigenvalue rotation
            eigs = rng.dirichlet(np.ones(dim)) * dim
            q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
            corr = q @ np.diag(eigs) @ q.T
            dd = np.sqrt(np.diag(corr))
            corr = corr / np.outer(dd, dd)
            np.fill_diagonal(corr, 1.0)
        else:
            corr = np.eye(1)
        cov = np.diag(stds) @ corr @ np.diag(stds)
        covs.append((cov + cov.T) / 2)
    return covs[0] if n_modes == 1 else covs


def info_random_gaussian_mixture(
    ranges, n_modes: int = 1, input_params_prefix: str = "",
    output_params_prefix: str = "", O_std_min=1e-2, O_std_max=1,
    derived: bool = False, random_state=None, add_ref: bool = False,
    mpi_aware: bool = False,
):
    """Input dict for a random Gaussian-mixture model over the given ranges."""
    covs = random_cov(ranges, n_modes=n_modes, O_std_min=O_std_min,
                      O_std_max=O_std_max, random_state=random_state)
    if n_modes == 1:
        covs = [covs]
    means = []
    for i in range(n_modes):
        std = np.sqrt(np.diag(covs[i]))
        inner = [
            [r[0] + 3 * s, r[1] - 3 * s] for r, s in zip(ranges, std)
        ]
        inner = [r if r[0] <= r[1] else [np.mean(r)] * 2 for r in inner]
        means.append(random_mean(inner, n_modes=1, random_state=random_state))
    dim = len(ranges)
    params: dict = {
        f"{input_params_prefix}_{i}": {
            "prior": {"min": ranges[i][0], "max": ranges[i][1]},
            "latex": rf"\alpha_{{{i}}}",
        }
        for i in range(dim)
    }
    if derived:
        params.update({
            f"{output_params_prefix}_{i}": {"latex": rf"\beta_{{{i}}}"}
            for i in range(dim * n_modes)
        })
    info = {
        "likelihood": {
            "gaussian_mixture": {
                "means": [m.tolist() for m in means],
                "covs": [c.tolist() for c in covs],
                "input_params_prefix": input_params_prefix,
                "output_params_prefix": output_params_prefix,
                "derived": derived,
            }
        },
        "params": params,
    }
    if add_ref:
        if n_modes > 1:
            raise ValueError("Cannot add a ref pdf for multimodal models.")
        for i, p in enumerate(list(params)[:dim]):
            params[p]["ref"] = {
                "dist": "norm", "loc": float(means[0][i]),
                "scale": float(np.sqrt(covs[0][i, i])),
            }
    return info
