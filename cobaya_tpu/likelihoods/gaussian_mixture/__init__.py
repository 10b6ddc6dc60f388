from .gaussian_mixture import (
    GaussianMixture,
    info_random_gaussian_mixture,
    random_cov,
    random_mean,
)
