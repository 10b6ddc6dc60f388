"""Planck 2018 high-l plik TTTEEE unbinned via the official clik code
(reference: cobaya/likelihoods/planck_2018_highl_plik/TTTEEE_unbinned.py)."""

from ..base_classes.planck_clik import PlanckClik


class TTTEEE_unbinned(PlanckClik):
    clik_file = "extended_plik/plc_3.0/hi_l/plik/plik_rd12_HM_v22b_TTTEEE_bin1.clik"
    aliases = ["plikHM_TTTEEE"]
