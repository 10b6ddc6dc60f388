"""Planck NPIPE (PR4) CamSpec TTTEEE
(reference: cobaya/likelihoods/planck_NPIPE_highl_CamSpec/TTTEEE.py)."""

from ..base_classes.camspec2021 import Planck2020CamSpecPython
from ..planck_2018_highl_CamSpec2021 import nuisance as nu


class TTTEEE(Planck2020CamSpecPython):
    bibtex_file = "CamSpec_NPIPE_2022.bibtex"
    dataset_file = "CamSpec_NPIPE/CamSpec_NPIPE_12_6_cl.dataset"
    use_cl = "143x143 217x217 143x217 TE EE".split()
    aliases = ["CamSpec_NPIPE_TTTEEE"]
    speed = 50
    params = {**nu.params_calib, **nu.params_TT, **nu.params_TE, **nu.params_EE}
