"""DESI 2024 BAO, QSO 0.8<z<2.1.

Requires the installed ``bao_data`` package (cobaya-tpu install).
Reference: cobaya/likelihoods/bao/desi_2024_bao_qso_z1.yaml.
"""

from ..base_classes.bao import BAO


class desi_2024_bao_qso_z1(BAO):
    measurements_file = 'bao_data/desi_2024_gaussian_bao_QSO_GCcomb_z0.8-2.1_mean.txt'
    cov_file = 'bao_data/desi_2024_gaussian_bao_QSO_GCcomb_z0.8-2.1_cov.txt'
    rs_fid = 1
    aliases = ["BAO"]
    speed = 2000
