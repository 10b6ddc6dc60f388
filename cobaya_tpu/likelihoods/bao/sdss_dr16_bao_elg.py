"""eBOSS DR16 ELG BAO (tabulated DV likelihood).

Requires the installed ``bao_data`` package (cobaya-tpu install).
Reference: cobaya/likelihoods/bao/sdss_dr16_bao_elg.yaml.
"""

from ..base_classes.bao import BAO


class sdss_dr16_bao_elg(BAO):
    grid_file = 'bao_data/sdss_DR16_ELG_BAO_DVtable.txt'
    observable_1 = 'DV_over_rs'
    redshift = 0.845
    aliases = ["BAO"]
    speed = 2000
