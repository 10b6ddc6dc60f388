"""Planck NPIPE (PR4) CamSpec EE
(reference: cobaya/likelihoods/planck_NPIPE_highl_CamSpec/EE.py)."""

from ..base_classes.camspec2021 import Planck2020CamSpecPython


class EE(Planck2020CamSpecPython):
    dataset_file = "CamSpec_NPIPE/CamSpec_NPIPE_12_6_cl.dataset"
    use_cl = "EE".split()
    aliases = ["CamSpec_NPIPE_EE"]
    speed = 50
