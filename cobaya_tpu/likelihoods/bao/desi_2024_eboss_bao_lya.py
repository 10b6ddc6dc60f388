"""Combined SDSS(eBOSS)+DESI 2024 Lya BAO.

Requires the installed ``bao_data`` package (cobaya-tpu install).
Reference: cobaya/likelihoods/bao/desi_2024_eboss_bao_lya.yaml.
"""

from ..base_classes.bao import BAO


class desi_2024_eboss_bao_lya(BAO):
    measurements_file = 'bao_data/desi_2024_eboss_gaussian_bao_Lya_GCcomb_mean.txt'
    cov_file = 'bao_data/desi_2024_eboss_gaussian_bao_Lya_GCcomb_cov.txt'
    rs_fid = 1
    aliases = ["BAO"]
    speed = 2000
