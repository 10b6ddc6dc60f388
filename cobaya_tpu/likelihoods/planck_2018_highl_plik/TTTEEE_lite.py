"""Planck 2018 high-l TT+TE+EE, foreground-marginalized (plik-lite, native).

Reference: cobaya/likelihoods/planck_2018_highl_plik/TTTEEE_lite_native.py.
"""

from .TT_lite import TT_lite, _calib_params


class TTTEEE_lite(TT_lite):
    use_cl = ["tt", "te", "ee"]
    aliases = ["plikHM_TTTEEE"]
    params = _calib_params


class TTTEEE_lite_native(TTTEEE_lite):
    pass
