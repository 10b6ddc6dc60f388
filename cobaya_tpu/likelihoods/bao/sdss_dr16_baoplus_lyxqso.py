"""eBOSS DR16 Lya x QSO BAO (2-D grid).

Requires the installed ``bao_data`` package (cobaya-tpu install).
Reference: cobaya/likelihoods/bao/sdss_dr16_baoplus_lyxqso.yaml.
"""

from ..base_classes.bao import BAO


class sdss_dr16_baoplus_lyxqso(BAO):
    grid_file = 'bao_data/sdss_DR16_LYxQSO_BAO_DMDHgrid.txt'
    observable_1 = 'DM_over_rs'
    observable_2 = 'DH_over_rs'
    redshift = 2.334
    aliases = ["BAO"]
    speed = 2000
