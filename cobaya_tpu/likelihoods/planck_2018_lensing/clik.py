"""Planck 2018 lensing via the official clik code
(reference: cobaya/likelihoods/planck_2018_lensing/clik.py)."""

from ..base_classes.planck_clik import PlanckClik
from ..planck_2018_highl_plik.nuisance import params_calib


class clik(PlanckClik):
    bibtex_file = "PlanckLensing2018.bibtex"
    clik_file = "baseline/plc_3.0/lensing/smicadx12_Dec5_ftl_mv2_ndclpp_p_teb_consext8.clik_lensing"
    aliases = ["lensing"]
    params = params_calib
