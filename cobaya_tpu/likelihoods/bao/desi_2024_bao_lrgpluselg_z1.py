"""DESI 2024 BAO, LRG+ELG 0.8<z<1.1.

Requires the installed ``bao_data`` package (cobaya-tpu install).
Reference: cobaya/likelihoods/bao/desi_2024_bao_lrgpluselg_z1.yaml.
"""

from ..base_classes.bao import BAO


class desi_2024_bao_lrgpluselg_z1(BAO):
    measurements_file = 'bao_data/desi_2024_gaussian_bao_LRG+ELG_LOPnotqso_GCcomb_z0.8-1.1_mean.txt'
    cov_file = 'bao_data/desi_2024_gaussian_bao_LRG+ELG_LOPnotqso_GCcomb_z0.8-1.1_cov.txt'
    rs_fid = 1
    aliases = ["BAO"]
    speed = 2000
