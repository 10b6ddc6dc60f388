"""Absolute-magnitude (Mb) measurement likelihood.

Capability parity with /root/reference/cobaya/likelihoods/base_classes/Mb.py:
Gaussian constraint on the SN absolute magnitude, to combine with a
supernova likelihood run with ``use_abs_mag: True``.
"""

from __future__ import annotations

from ...models.likelihood import Likelihood


class Mb(Likelihood):
    type = "Mb"

    Mb_mean: float
    Mb_std: float

    def initialize(self):
        self._minus_half_invvar = -0.5 / self.Mb_std**2

    def get_requirements(self):
        return {}

    def get_can_support_params(self):
        return ["Mb"]

    def logp_jax(self, params, provider_products=None):
        return self._minus_half_invvar * (params["Mb"] - self.Mb_mean) ** 2, {}
