"""Planck 2018 high-l plik EE via the official clik code
(reference: cobaya/likelihoods/planck_2018_highl_plik/EE.py)."""

from ..base_classes.planck_clik import PlanckClik
from . import nuisance as nu


class EE(PlanckClik):
    clik_file = "extended_plik/plc_3.0/hi_l/plik/plik_rd12_HM_v22_EE.clik"
    aliases = ["plikHM_EE"]
    speed = 100
    params = {**nu.params_calib, **nu.params_calib_pol, **nu.params_EE}
