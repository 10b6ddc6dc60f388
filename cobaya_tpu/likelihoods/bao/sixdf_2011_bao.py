"""6dF Galaxy Survey BAO (Beutler et al. 2011, arXiv:1106.3366).

Reference: cobaya/likelihoods/bao/sixdf_2011_bao.yaml (inline data row,
sound-horizon rescale 153.9/149.8).
"""

from ..base_classes.bao import BAO


class sixdf_2011_bao(BAO):
    """rs/DV = 0.336 +/- 0.015 at z = 0.106."""

    data = [0.106, 0.336, 0.015, "rs_over_DV"]
    rs_rescale = 1.027369826  # = 153.9 / 149.8
    aliases = ["BAO"]
    speed = 5000
