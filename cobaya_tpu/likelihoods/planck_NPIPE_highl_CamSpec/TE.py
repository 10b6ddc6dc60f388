"""Planck NPIPE (PR4) CamSpec TE
(reference: cobaya/likelihoods/planck_NPIPE_highl_CamSpec/TE.py)."""

from ..base_classes.camspec2021 import Planck2020CamSpecPython
from ..planck_2018_highl_CamSpec2021 import nuisance as nu


class TE(Planck2020CamSpecPython):
    bibtex_file = "CamSpec_NPIPE_2022.bibtex"
    dataset_file = "CamSpec_NPIPE/CamSpec_NPIPE_12_6_cl.dataset"
    use_cl = "TE".split()
    aliases = ["CamSpec_NPIPE_TE"]
    speed = 50
    params = {**nu.params_calib, **nu.params_TE, **nu.params_fixedcalEE}
