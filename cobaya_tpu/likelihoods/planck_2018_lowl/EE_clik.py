"""Planck 2018 low-l EE (SimAll) via the official clik code
(reference: cobaya/likelihoods/planck_2018_lowl/EE_clik.py)."""

from ..base_classes.planck_clik import PlanckClik
from ..planck_2018_highl_plik.nuisance import params_calib


class EE_clik(PlanckClik):
    clik_file = "baseline/plc_3.0/low_l/simall/simall_100x143_offlike5_EE_Aplanck_B.clik"
    aliases = ["lowE"]
    params = params_calib
