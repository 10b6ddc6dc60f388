"""Evaluate sampler: compute the posterior at one or a few reference points.

Capability parity with /root/reference/cobaya/samplers/evaluate/evaluate.py:
draws N points from the reference pdf (with optional per-parameter
``override``), logs priors/likelihoods/derived values, and stores them in a
collection.
"""

from __future__ import annotations

from typing import Optional

from ...io.collection import SampleCollection
from ...utils.log import LoggedError
from ..sampler import Sampler


class Evaluate(Sampler):
    file_base_name = "evaluate"

    N: int = 1
    override: Optional[dict] = None

    def initialize(self):
        self.collection = SampleCollection(self.model, self.output, name="1")

    def run(self):
        model = self.model
        sampled = list(model.parameterization.sampled_params())
        for i in range(int(self.N)):
            point = model.prior.reference(
                warn_if_no_ref=(i == 0), random_state=self.rng
            )
            if self.override:
                for p, v in self.override.items():
                    if p not in sampled:
                        raise LoggedError(
                            self.log, "Unknown parameter in override: '%s'", p
                        )
                    point[sampled.index(p)] = v
            results = model.logposterior(point)
            self.collection.add(
                point, derived=results.derived, weight=1,
                logpriors=results.logpriors, loglikes=results.loglikes,
                logpost=results.logpost,
            )
            self.log.info("Point %d:", i + 1)
            for p, v in zip(sampled, point):
                self.log.info("   %s = %g", p, v)
            self.log.info("   logposterior = %g", results.logpost)
            self.log.info("   logpriors = %r",
                          dict(zip(model.prior.names, results.logpriors)))
            self.log.info("   loglikes = %r",
                          dict(zip(model.likelihood, results.loglikes)))
            self.log.info("   derived = %r", dict(zip(
                model.parameterization.derived_params(), results.derived or []
            )))
        self.collection.out_update()

    def products(self, **kwargs):
        return {"sample": self.collection}
