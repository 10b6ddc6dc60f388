"""Planck 2018 high-l plik TTTEEE unbinned via the official clik code
(reference: cobaya/likelihoods/planck_2018_highl_plik/TTTEEE_unbinned.py)."""

from ..base_classes.planck_clik import PlanckClik
from . import nuisance as nu


class TTTEEE_unbinned(PlanckClik):
    clik_file = "extended_plik/plc_3.0/hi_l/plik/plik_rd12_HM_v22b_TTTEEE_bin1.clik"
    aliases = ["plikHM_TTTEEE"]
    speed = 2.5
    params = {**nu.params_calib, **nu.params_calib_temp,
              **nu.params_calib_pol, **nu.params_TT, **nu.params_TE,
              **nu.params_EE}
    prior = nu.prior_SZ
