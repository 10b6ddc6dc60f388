"""SDSS DR16 QSO BAO DM/DH (Alam et al. 2020).

Requires the installed ``bao_data`` package (cobaya-tpu install).
Reference: cobaya/likelihoods/bao/sdss_dr16_qso_bao_dmdh.yaml.
"""

from ..base_classes.bao import BAO


class sdss_dr16_qso_bao_dmdh(BAO):
    measurements_file = 'bao_data/sdss_DR16_QSO_BAO_DMDH.txt'
    cov_file = 'bao_data/sdss_DR16_QSO_BAO_DMDH_covtot.txt'
    rs_fid = 1
    aliases = ["BAO"]
    speed = 2000
