"""Pantheon SNIa sample (Scolnic et al. 2018, arXiv:1710.00845).

Requires the installed ``sn_data`` package (cobaya-tpu install).
"""

from ..base_classes.sn import SN


class pantheon(SN):
    data_file = "Pantheon/lcparam_full_long.txt"
    covmat_file = "Pantheon/sys_full_long.txt"
    aliases = ["Pantheon", "Pantheon18"]
    use_abs_mag = False
    speed = 100
