"""Unit likelihood: log-likelihood always 0 (absorbs unused parameters).

Capability parity with /root/reference/cobaya/likelihoods/one/one.py.
"""

from __future__ import annotations

import time
from typing import Optional

from ...models.likelihood import AbsorbUnusedParamsLikelihood


class one(AbsorbUnusedParamsLikelihood):
    """Likelihood that evaluates to 1."""

    noise: Optional[float] = None
    delay: float = 0

    def logp_jax(self, params, provider_products=None):
        if self.delay:
            time.sleep(self.delay)
        if self.noise:
            import numpy as np

            # host-side noise (non-deterministic; only for stress tests)
            return self.noise * float(np.random.random()), {}
        return 0.0, {}
