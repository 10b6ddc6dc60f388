"""Local H0 measurement: freedman2020 (arXiv:2002.01550)."""

from ..base_classes.h0 import H0


class freedman2020(H0):
    """H0 = 69.6 +/- 1.88 km/s/Mpc (arXiv:2002.01550)."""

    H0_mean = 69.6
    H0_std = 1.88
    aliases = ["Riess18"]
    speed = 4500
