"""DESI 2024 BAO, LRG 0.6<z<0.8.

Requires the installed ``bao_data`` package (cobaya-tpu install).
Reference: cobaya/likelihoods/bao/desi_2024_bao_lrg_z2.yaml.
"""

from ..base_classes.bao import BAO


class desi_2024_bao_lrg_z2(BAO):
    measurements_file = 'bao_data/desi_2024_gaussian_bao_LRG_GCcomb_z0.6-0.8_mean.txt'
    cov_file = 'bao_data/desi_2024_gaussian_bao_LRG_GCcomb_z0.6-0.8_cov.txt'
    rs_fid = 1
    aliases = ["BAO"]
    speed = 2000
