"""Planck 2018 high-l plik TT unbinned via the official clik code
(reference: cobaya/likelihoods/planck_2018_highl_plik/TT_unbinned.py)."""

from ..base_classes.planck_clik import PlanckClik
from . import nuisance as nu


class TT_unbinned(PlanckClik):
    clik_file = "extended_plik/plc_3.0/hi_l/plik/plik_rd12_HM_v22_TT_bin1.clik"
    aliases = ["plikHM_TT"]
    speed = 7
    params = {**nu.params_calib, **nu.params_calib_temp, **nu.params_TT}
    prior = nu.prior_SZ
