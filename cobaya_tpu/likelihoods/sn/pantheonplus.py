"""Pantheon+ SNIa sample, without SH0ES (Brout et al. 2022,
arXiv:2202.04077).

Reference: cobaya/likelihoods/sn/pantheonplus.py.
"""

from ..base_classes.sn import PantheonPlusLike


class pantheonplus(PantheonPlusLike):
    dataset_file = "PantheonPlus/config.dataset"
    aliases = ["PantheonPlus"]
    use_abs_mag = False
    speed = 100
