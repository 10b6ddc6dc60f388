"""Planck 2018 CamSpec 12.6HMcl TTTEEE
(reference: cobaya/likelihoods/planck_2018_highl_CamSpec2021/TTTEEE.py)."""

from ..base_classes.camspec2021 import CamSpec2021
from . import nuisance as nu


class TTTEEE(CamSpec2021):
    dataset_file = "CamSpec2021/CamSpecHM_12_6_cl.dataset"
    use_cl = "143x143 217x217 143x217 TE EE".split()
    aliases = ["CamSpec2021HM_TTTEEE"]
    speed = 10
    params = {**nu.params_calib, **nu.params_TT, **nu.params_TE, **nu.params_EE}
