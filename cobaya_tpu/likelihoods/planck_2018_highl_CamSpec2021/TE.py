"""Planck 2018 CamSpec 12.6HMcl TE
(reference: cobaya/likelihoods/planck_2018_highl_CamSpec2021/TE.py)."""

from ..base_classes.camspec2021 import CamSpec2021
from . import nuisance as nu


class TE(CamSpec2021):
    dataset_file = "CamSpec2021/CamSpecHM_12_6_cl.dataset"
    use_cl = "TE".split()
    aliases = ["CamSpec2021HM_TE"]
    speed = 160
    params = {**nu.params_calib, **nu.params_TE, **nu.params_fixedcalEE}
