"""Planck NPIPE (PR4) CamSpec TE+EE
(reference: cobaya/likelihoods/planck_NPIPE_highl_CamSpec/TEEE.py)."""

from ..base_classes.camspec2021 import Planck2020CamSpecPython
from ..planck_2018_highl_CamSpec2021 import nuisance as nu


class TEEE(Planck2020CamSpecPython):
    bibtex_file = "CamSpec_NPIPE_2022.bibtex"
    dataset_file = "CamSpec_NPIPE/CamSpec_NPIPE_12_6_cl.dataset"
    use_cl = "TE EE".split()
    aliases = ["CamSpec_NPIPE_TEEE"]
    speed = 60
    params = {**nu.params_calib, **nu.params_TE, **nu.params_EE}
