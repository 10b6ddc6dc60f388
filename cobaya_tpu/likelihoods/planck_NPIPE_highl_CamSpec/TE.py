"""Planck NPIPE (PR4) CamSpec TE
(reference: cobaya/likelihoods/planck_NPIPE_highl_CamSpec/TE.py)."""

from ..base_classes.camspec2021 import Planck2020CamSpecPython


class TE(Planck2020CamSpecPython):
    dataset_file = "CamSpec_NPIPE/CamSpec_NPIPE_12_6_cl.dataset"
    use_cl = "TE".split()
    aliases = ["CamSpec_NPIPE_TE"]
    speed = 50
