"""JLA SNIa sample, grid-marginalized over alpha/beta (for importance
sampling; different chi2 normalization than sn.jla).

Reference: cobaya/likelihoods/sn/jla_lite.yaml.
"""

from ..base_classes.sn import SN


class jla_lite(SN):
    dataset_file = "JLA/jla.dataset"
    marginalize = True
    precompute_covmats = True
    marginalize_params = {
        "marge_steps": 7, "alpha_centre": 0.14, "beta_centre": 3.123,
        "step_width_alpha": 0.003, "step_width_beta": 0.04,
    }
    aliases = ["JLA"]
    use_abs_mag = False
    speed = 10
