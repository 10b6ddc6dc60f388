"""CamSpec 2021 / NPIPE variant: power-law foreground residual model.

Capability parity with /root/reference/cobaya/likelihoods/
planck_2018_highl_CamSpec2021/planck_2018_CamSpec2021_python.py: per
cross-spectrum power-law residuals D_l = amp * (l/1500)^tilt, selectable via
``use_fg_residual_model`` (0 = power law, 1 = physical foregrounds,
2 = both).
"""

from __future__ import annotations

import numpy as np

from .camspec import CamSpec

_POWERLAW_PIVOT = 1500


class CamSpec2021(CamSpec):
    bibtex_file = "CamSpec2021.bibtex"
    def get_powerlaw_residuals(self, p: dict) -> np.ndarray:
        amp = np.array([p["amp_100"], p["amp_143"], p["amp_217"],
                        p["amp_143x217"]])
        tilt = np.array([p["n_100"], p["n_143"], p["n_217"],
                         p["n_143x217"]])
        with np.errstate(divide="ignore"):
            lnl = np.where(self.ls > 0,
                           np.log(np.maximum(self.ls, 1)
                                  / _POWERLAW_PIVOT), 0.0)
        return amp[:, None] * np.exp(tilt[:, None] * lnl[None, :])

    def get_foregrounds(self, p: dict) -> np.ndarray:
        mode = int(p.get("use_fg_residual_model", 0))
        if mode == 0:
            return self.get_powerlaw_residuals(p)
        if mode == 1:
            return super().get_foregrounds(p)
        if mode == 2:
            return super().get_foregrounds(p) + self.get_powerlaw_residuals(p)
        raise ValueError("use_fg_residual_model must be 0, 1 or 2")

    def get_can_support_params(self):
        return super().get_can_support_params() + [
            "amp_100", "amp_143", "amp_217", "amp_143x217",
            "n_100", "n_143", "n_217", "n_143x217", "use_fg_residual_model",
        ]


Planck2018CamSpec2021Python = CamSpec2021


class Planck2020CamSpecPython(CamSpec2021):
    """NPIPE (PR4) CamSpec (arXiv:2205.10869)."""

    install_options = {
        "github_repository": "CobayaSampler/planck_native_data",
        "github_release": "v1",
        "asset": "CamSpec_NPIPE.zip",
        "directory": "planck_NPIPE_CamSpec",
    }
