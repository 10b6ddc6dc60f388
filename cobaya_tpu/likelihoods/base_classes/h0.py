"""Local H0 measurement likelihood (Gaussian in H0).

Capability parity with /root/reference/cobaya/likelihoods/base_classes/H0.py.
"""

from __future__ import annotations

from ...models.likelihood import Likelihood


class H0(Likelihood):
    """Gaussian constraint on today's Hubble parameter."""

    type = "H0"
    # H0 reaches the traced path either as a model input param
    # (sampled H0) or as a provider product (derived H0, e.g. when
    # sampling theta); both are traced values, so the Gaussian runs
    # fully on device
    jittable = True

    H0_mean: float
    H0_std: float

    def initialize(self):
        self._minus_half_invvar = -0.5 / self.H0_std**2

    def get_requirements(self):
        return {"H0": None}

    def logp(self, _derived=None, **params_values):
        H0_theory = self.provider.get_param("H0")
        return float(
            self._minus_half_invvar * (H0_theory - self.H0_mean) ** 2
        )

    def logp_jax(self, params, provider_products=None):
        from ...theories.cosmo.traced import TracedCosmoProducts

        H0_theory = TracedCosmoProducts(
            self, provider_products).get_param("H0")
        return self._minus_half_invvar * (H0_theory - self.H0_mean) ** 2, {}
