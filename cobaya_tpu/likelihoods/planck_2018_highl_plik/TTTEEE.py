"""Planck 2018 high-l plik TT+TE+EE via the official clik code
(reference: cobaya/likelihoods/planck_2018_highl_plik/TTTEEE.py)."""

from ..base_classes.planck_clik import PlanckClik


class TTTEEE(PlanckClik):
    clik_file = "baseline/plc_3.0/hi_l/plik/plik_rd12_HM_v22b_TTTEEE.clik"
    aliases = ["plikHM_TTTEEE"]
