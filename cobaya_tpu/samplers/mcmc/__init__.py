from .mcmc import MCMC
