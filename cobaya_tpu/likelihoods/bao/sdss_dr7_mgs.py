"""SDSS DR7 Main Galaxy Sample BAO (Ross et al. 2015, arXiv:1409.3242).

Reference: cobaya/likelihoods/bao/sdss_dr7_mgs.yaml -- interpolates the
published non-Gaussian chi2(alpha) table over alpha = DV/DV_fid.
"""

from ..base_classes.bao import BAO


class sdss_dr7_mgs(BAO):
    prob_dist = "bao_data/sdss_MGS_prob.txt"
    prob_dist_bounds = [0.8005, 1.1985]
    # DV_fid / rs_fid = 638.9518 / 148.69
    rs_rescale = 4.29720761315
    data = [0.15, 4.465666824, 0.1681350461, "DV_over_rs"]
    aliases = ["BAO"]
    speed = 5000
