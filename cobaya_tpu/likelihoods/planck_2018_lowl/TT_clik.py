"""Planck 2018 low-l TT via the official clik code
(reference: cobaya/likelihoods/planck_2018_lowl/TT_clik.py)."""

from ..base_classes.planck_clik import PlanckClik
from ..planck_2018_highl_plik.nuisance import params_calib


class TT_clik(PlanckClik):
    clik_file = "baseline/plc_3.0/low_l/commander/commander_dx12_v3_2_29.clik"
    aliases = ["lowT"]
    params = params_calib
