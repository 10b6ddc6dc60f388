"""Planck 2018 lensing likelihoods.

Reference: cobaya/likelihoods/planck_2018_lensing/__init__.py --
``native`` (python CMBlikes-format reimplementation) and ``CMBMarged``
(marginalized over the CMB power spectra), plus the clik wrapper.
"""

from ..base_classes.cmblikes import CMBlikes


class native(CMBlikes):
    bibtex_file = "PlanckLensing2018.bibtex"
    """Planck 2018 T+P map-based lensing reconstruction likelihood
    (python-native dataset)."""

    install_options = {
        "github_repository": "CobayaSampler/planck_supp_data_and_covmats",
        "github_release": "v2.1",
        "directory": "planck_supp_data_and_covmats",
    }
    dataset_file = ("lensing/2018/"
                    "smicadx12_Dec5_ftl_mv2_ndclpp_p_teb_consext8.dataset")
    aliases = ["lensing"]
    speed = 50

    params = {
        "A_planck": {
            "prior": {"dist": "norm", "loc": 1, "scale": 0.0025},
            "ref": {"dist": "norm", "loc": 1, "scale": 0.002},
            "proposal": 0.0005,
            "latex": "y_\\mathrm{cal}",
            "renames": ["calPlanck"],
        },
    }


class CMBMarged(native):
    """Planck 2018 lensing, marginalized over the CMB power spectra
    (no nuisance parameters)."""

    dataset_file = (
        "lensing/2018/"
        "smicadx12_Dec5_ftl_mv2_ndclpp_p_teb_consext8_CMBmarged.dataset"
    )
    speed = 90
    params = None
