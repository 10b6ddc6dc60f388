"""DESI 2024 BAO, BGS 0.1<z<0.4.

Requires the installed ``bao_data`` package (cobaya-tpu install).
Reference: cobaya/likelihoods/bao/desi_2024_bao_bgs_z1.yaml.
"""

from ..base_classes.bao import BAO


class desi_2024_bao_bgs_z1(BAO):
    measurements_file = 'bao_data/desi_2024_gaussian_bao_BGS_BRIGHT-21.5_GCcomb_z0.1-0.4_mean.txt'
    cov_file = 'bao_data/desi_2024_gaussian_bao_BGS_BRIGHT-21.5_GCcomb_z0.1-0.4_cov.txt'
    rs_fid = 1
    aliases = ["BAO"]
    speed = 2000
