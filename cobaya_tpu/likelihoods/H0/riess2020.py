"""Local H0 measurement: riess2020 (arXiv:2012.08534)."""

from ..base_classes.h0 import H0


class riess2020(H0):
    """H0 = 73.2 +/- 1.3 km/s/Mpc (arXiv:2012.08534)."""

    H0_mean = 73.2
    H0_std = 1.3
    aliases = ["Riess18"]
    speed = 4500
