"""DESI 2024 BAO, all tracers (arXiv:2404.03002).

Requires the installed ``bao_data`` package (cobaya-tpu install).
Reference: cobaya/likelihoods/bao/desi_2024_bao_all.yaml.
"""

from ..base_classes.bao import BAO


class desi_2024_bao_all(BAO):
    measurements_file = 'bao_data/desi_2024_gaussian_bao_ALL_GCcomb_mean.txt'
    cov_file = 'bao_data/desi_2024_gaussian_bao_ALL_GCcomb_cov.txt'
    rs_fid = 1
    aliases = ["BAO"]
    speed = 2000
