"""Pantheon SNIa sample (Scolnic et al. 2018, arXiv:1710.00845).

Requires the installed ``sn_data`` package (cobaya-tpu install).
Reference: cobaya/likelihoods/sn/pantheon.yaml.
"""

from ..base_classes.sn import SN


class pantheon(SN):
    dataset_file = "Pantheon/full_long.dataset"
    aliases = ["Pantheon", "Pantheon18"]
    use_abs_mag = False
    speed = 100
