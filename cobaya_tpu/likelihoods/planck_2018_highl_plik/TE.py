"""Planck 2018 high-l plik TE via the official clik code
(reference: cobaya/likelihoods/planck_2018_highl_plik/TE.py)."""

from ..base_classes.planck_clik import PlanckClik
from . import nuisance as nu


class TE(PlanckClik):
    clik_file = "extended_plik/plc_3.0/hi_l/plik/plik_rd12_HM_v22_TE.clik"
    aliases = ["plikHM_TE"]
    speed = 100
    params = {**nu.params_calib, **nu.params_calib_temp,
              **nu.params_calib_pol, **nu.params_TE}
