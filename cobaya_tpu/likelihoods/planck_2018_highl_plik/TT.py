"""Planck 2018 high-l plik TT via the official clik code
(reference: cobaya/likelihoods/planck_2018_highl_plik/TT.py)."""

from ..base_classes.planck_clik import PlanckClik
from . import nuisance as nu


class TT(PlanckClik):
    clik_file = "baseline/plc_3.0/hi_l/plik/plik_rd12_HM_v22_TT.clik"
    aliases = ["plikHM_TT"]
    speed = 50
    params = {**nu.params_calib, **nu.params_calib_temp, **nu.params_TT}
    prior = nu.prior_SZ
