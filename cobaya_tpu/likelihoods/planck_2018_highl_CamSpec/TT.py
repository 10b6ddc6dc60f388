"""Planck 2018 high-l CamSpec TT (python-native).

Reference: cobaya/likelihoods/planck_2018_highl_CamSpec/TT.py.
Requires the planck_2018_CamSpec_native data package.
"""

from ..base_classes.camspec import CamSpec
from . import nuisance as nu


class TT(CamSpec):
    dataset_file = "CamSpec2018/CamSpecHM_10_7.dataset"
    use_cl = ["100x100", "143x143", "217x217", "143x217"]
    aliases = ["CamSpecHM_TT"]
    speed = 50
    params = nu.params_full
    prior = nu.prior_SZ
