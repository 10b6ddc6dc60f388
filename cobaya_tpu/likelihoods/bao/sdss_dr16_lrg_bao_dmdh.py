"""SDSS DR16 LRG BAO DM/DH (Alam et al. 2020).

Requires the installed ``bao_data`` package (cobaya-tpu install).
Reference: cobaya/likelihoods/bao/sdss_dr16_lrg_bao_dmdh.yaml.
"""

from ..base_classes.bao import BAO


class sdss_dr16_lrg_bao_dmdh(BAO):
    measurements_file = 'bao_data/sdss_DR16_LRG_BAO_DMDH.dat'
    cov_file = 'bao_data/sdss_DR16_LRG_BAO_DMDH_covtot.txt'
    rs_fid = 1
    aliases = ["BAO"]
    speed = 2000
