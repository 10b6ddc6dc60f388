"""Local H0 measurement: riess2018b (arXiv:1804.10655)."""

from ..base_classes.h0 import H0


class riess2018b(H0):
    """H0 = 73.52 +/- 1.62 km/s/Mpc (arXiv:1804.10655)."""

    H0_mean = 73.52
    H0_std = 1.62
    aliases = ["Riess18"]
    speed = 4500
