"""Riess et al 2020 constraint expressed as an Mb measurement
(arXiv:2012.08534); combine with sn.pantheon with use_abs_mag: True."""

from ..base_classes.mb import Mb


class riess2020Mb(Mb):
    bibtex_file = "riess2020.bibtex"
    """Mb = -19.263 +/- 0.049 (arXiv:2012.08534)."""

    Mb_mean = -19.263
    Mb_std = 0.049
    aliases = ["Riess20Mb"]
    speed = 4500
    params = {"Mb": {"prior": {"min": -20, "max": -18}, "latex": "M_b"}}
