"""Planck low-l EE SRoll2 likelihood (python probability table).

Reference: cobaya/likelihoods/planck_2018_lowl/EE_sroll2.py (pagano et al
arXiv:1908.09856); same table-lookup form as the SimAll EE likelihood with
the SRoll2 reprocessed maps.
"""

from .EE import EE


class EE_sroll2(EE):
    install_options = {
        "github_repository": "CobayaSampler/planck_native_data",
        "github_release": "v1",
        "asset": "planck_2018_lowE_sroll2.zip",
        "directory": "planck_2018_lowE_sroll2_native",
    }
    aliases = ["lowE_sroll2"]
