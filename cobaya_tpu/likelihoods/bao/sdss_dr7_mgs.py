"""SDSS DR7 Main Galaxy Sample BAO (Ross et al. 2015, arXiv:1409.3242).

The reference interpolates the published non-Gaussian probability grid
(sdss_MGS_prob.txt); here the Gaussian approximation DV/rs = 4.47 +/- 0.17
at z = 0.15 is used until the grid interpolation lands (tracked).
"""

from ..base_classes.bao import BAO


class sdss_dr7_mgs(BAO):
    measurements = [(0.15, 4.465666824, "DV_over_rs", 0.1681350461)]
    aliases = ["BAO"]
    speed = 5000
