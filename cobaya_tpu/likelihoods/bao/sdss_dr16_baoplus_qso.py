"""eBOSS DR16 QSO BAO+FS (Alam et al. 2020).

Requires the installed ``bao_data`` package (cobaya-tpu install).
Reference: cobaya/likelihoods/bao/sdss_dr16_baoplus_qso.yaml.
"""

from ..base_classes.bao import BAO


class sdss_dr16_baoplus_qso(BAO):
    measurements_file = 'bao_data/sdss_DR16_BAOplus_QSO_FSBAO_DMDHfs8.dat'
    cov_file = 'bao_data/sdss_DR16_BAOplus_QSO_FSBAO_DMDHfs8_covtot.txt'
    aliases = ["BAO"]
    speed = 2000
