"""Planck 2018 high-l TT, foreground-marginalized (plik-lite, native python).

Reference: cobaya/likelihoods/planck_2018_highl_plik/TT_lite_native.py.
Requires the planck_2018_pliklite_native data package
(``cobaya-tpu install``).
"""

from ..base_classes.planck_pliklite import PlanckPlikLite

_calib_params = {
    "A_planck": {
        "prior": {"dist": "norm", "loc": 1, "scale": 0.0025},
        "ref": {"dist": "norm", "loc": 1, "scale": 0.002},
        "proposal": 0.0005,
        "latex": "y_\\mathrm{cal}",
        "renames": ["calPlanck"],
    },
}


class TT_lite(PlanckPlikLite):
    dataset_file = "plik_lite_v22.dataset"
    use_cl = ["tt"]
    aliases = ["plikHM_TT"]
    speed = 200
    params = _calib_params


class TT_lite_native(TT_lite):
    pass
