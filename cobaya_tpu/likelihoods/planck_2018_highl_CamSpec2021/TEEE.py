"""Planck 2018 CamSpec 12.6HMcl TEEE
(reference: cobaya/likelihoods/planck_2018_highl_CamSpec2021/TEEE.py)."""

from ..base_classes.camspec2021 import CamSpec2021
from . import nuisance as nu


class TEEE(CamSpec2021):
    dataset_file = "CamSpec2021/CamSpecHM_12_6_cl.dataset"
    use_cl = "TE EE".split()
    aliases = ["CamSpec2021HM_TEEE"]
    speed = 60
    params = {**nu.params_calib, **nu.params_TE, **nu.params_EE}
