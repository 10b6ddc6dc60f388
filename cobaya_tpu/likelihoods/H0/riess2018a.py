"""Local H0 measurement: riess2018a (arXiv:1801.01120)."""

from ..base_classes.h0 import H0


class riess2018a(H0):
    """H0 = 73.45 +/- 1.66 km/s/Mpc (arXiv:1801.01120)."""

    H0_mean = 73.45
    H0_std = 1.66
    aliases = ["Riess18"]
    speed = 4500
