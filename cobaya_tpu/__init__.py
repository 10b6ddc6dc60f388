"""cobaya_tpu: TPU-native Bayesian inference framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of cobaya
(CobayaSampler/cobaya): declarative model specification, adaptive blocked
Metropolis MCMC with thousands of vmapped walkers per chip, nested sampling,
minimization, and importance-reweighting post-processing.
"""

__version__ = "0.1.0"

__obsolete__ = False
__year__ = "2026"

from .models.model import LogPosterior, Model, get_model
from .models.likelihood import Likelihood
from .models.theory import Theory
from .utils.log import LoggedError
from .utils.typing_ import InputDict, PostDict


def run(*args, **kwargs):
    from .run import run as _run

    return _run(*args, **kwargs)


def post(*args, **kwargs):
    from .post import post as _post

    return _post(*args, **kwargs)


def load_samples(*args, **kwargs):
    from .io.output import load_samples as _load

    return _load(*args, **kwargs)
