"""6dF Galaxy Survey BAO (Beutler et al. 2011, arXiv:1106.3366)."""

from ..base_classes.bao import BAO


class sixdf_2011_bao(BAO):
    """rs/DV = 0.336 +/- 0.015 at z = 0.106."""

    measurements = [(0.106, 0.336, "rs_over_DV", 0.015)]
    aliases = ["BAO"]
    speed = 5000
