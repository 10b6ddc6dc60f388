"""Local H0 measurement: riess201903 (arXiv:1903.07603)."""

from ..base_classes.h0 import H0


class riess201903(H0):
    """H0 = 74.03 +/- 1.42 km/s/Mpc (arXiv:1903.07603)."""

    H0_mean = 74.03
    H0_std = 1.42
    aliases = ["Riess18"]
    speed = 4500
