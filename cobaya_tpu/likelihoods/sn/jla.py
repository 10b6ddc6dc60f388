"""JLA SNIa sample (Betoule et al. 2014, arXiv:1401.4064) with sampled
alpha/beta light-curve corrections.

Reference: cobaya/likelihoods/sn/jla.yaml (incl. the alpha_jla/beta_jla
nuisance parameter block).
"""

from ..base_classes.sn import SN


class jla(SN):
    dataset_file = "JLA/jla.dataset"
    alpha_beta_names = ["alpha_jla", "beta_jla"]
    aliases = ["JLA"]
    use_abs_mag = False
    speed = 20
    params = {
        "alpha_jla": {
            "prior": {"min": 0.01, "max": 2},
            "ref": {"dist": "norm", "loc": 0.14, "scale": 0.005},
            "proposal": 0.005,
            "latex": r"\alpha_\mathrm{JLA}",
        },
        "beta_jla": {
            "prior": {"min": 0.9, "max": 4.6},
            "ref": {"dist": "norm", "loc": 3.1, "scale": 0.05},
            "proposal": 0.05,
            "latex": r"\beta_\mathrm{JLA}",
        },
    }
