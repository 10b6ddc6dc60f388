"""eBOSS DR16 ELG BAO+FS (3-D likelihood grid).

Requires the installed ``bao_data`` package (cobaya-tpu install).
Reference: cobaya/likelihoods/bao/sdss_dr16_baoplus_elg.yaml.
"""

from ..base_classes.bao import BAO


class sdss_dr16_baoplus_elg(BAO):
    grid_file = 'bao_data/sdss_DR16_ELG_FSBAO_DMDHfs8gridlikelihood.txt'
    observable_1 = 'DM_over_rs'
    observable_2 = 'DH_over_rs'
    observable_3 = 'f_sigma8'
    redshift = 0.85
    aliases = ["BAO"]
    speed = 2000
