from ..gaussian_mixture.gaussian_mixture import GaussianMixture


class gaussian(GaussianMixture):
    """Single-mode Gaussian likelihood (alias of a 1-mode mixture).

    Reference: /root/reference/cobaya/likelihoods/gaussian.
    """

    file_base_name = "gaussian_mixture"
