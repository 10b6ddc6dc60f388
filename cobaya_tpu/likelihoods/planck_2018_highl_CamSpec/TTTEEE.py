"""Planck 2018 high-l CamSpec TT+TE+EE (python-native).

Reference: cobaya/likelihoods/planck_2018_highl_CamSpec/TTTEEE.py.
"""

from ..base_classes.camspec import CamSpec
from . import nuisance as nu


class TTTEEE(CamSpec):
    dataset_file = "CamSpec2018/CamSpecHM_10_7.dataset"
    use_cl = ["100x100", "143x143", "217x217", "143x217", "TE", "EE"]
    aliases = ["CamSpecHM_TTTEEE"]
    speed = 50
    params = nu.params_full
    prior = nu.prior_SZ
