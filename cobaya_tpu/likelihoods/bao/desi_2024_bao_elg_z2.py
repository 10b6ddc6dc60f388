"""DESI 2024 BAO, ELG 1.1<z<1.6.

Requires the installed ``bao_data`` package (cobaya-tpu install).
Reference: cobaya/likelihoods/bao/desi_2024_bao_elg_z2.yaml.
"""

from ..base_classes.bao import BAO


class desi_2024_bao_elg_z2(BAO):
    measurements_file = 'bao_data/desi_2024_gaussian_bao_ELG_LOPnotqso_GCcomb_z1.1-1.6_mean.txt'
    cov_file = 'bao_data/desi_2024_gaussian_bao_ELG_LOPnotqso_GCcomb_z1.1-1.6_cov.txt'
    rs_fid = 1
    aliases = ["BAO"]
    speed = 2000
