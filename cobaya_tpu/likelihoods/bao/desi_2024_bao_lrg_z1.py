"""DESI 2024 BAO, LRG 0.4<z<0.6.

Requires the installed ``bao_data`` package (cobaya-tpu install).
Reference: cobaya/likelihoods/bao/desi_2024_bao_lrg_z1.yaml.
"""

from ..base_classes.bao import BAO


class desi_2024_bao_lrg_z1(BAO):
    measurements_file = 'bao_data/desi_2024_gaussian_bao_LRG_GCcomb_z0.4-0.6_mean.txt'
    cov_file = 'bao_data/desi_2024_gaussian_bao_LRG_GCcomb_z0.4-0.6_cov.txt'
    rs_fid = 1
    aliases = ["BAO"]
    speed = 2000
