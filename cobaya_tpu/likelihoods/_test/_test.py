"""Test dummy likelihood (reference: cobaya/likelihoods/_test)."""

from ...models.likelihood import Likelihood


class _test(Likelihood):
    """Likelihood that evaluates to 1, with a dummy derived param."""

    delay: float = 0

    def logp_jax(self, params, provider_products=None):
        if self.delay:
            import time

            time.sleep(self.delay)
        return 0.0, {"b1": 0.0}
