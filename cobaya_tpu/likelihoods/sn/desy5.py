"""DES Year-5 SNIa sample (DES Collaboration 2024, arXiv:2401.02929).

Reference: cobaya/likelihoods/sn/desy5.py (comma-separated columns,
per-SN distance-modulus errors in the diagonal).
"""

from ..base_classes.sn import PantheonPlusLike


class desy5(PantheonPlusLike):
    dataset_file = "DESY5/config.dataset"
    aliases = ["DESY5"]
    use_abs_mag = False
    speed = 100

    _file_cols = ["zhd", "zhel", "mu", "muerr_final"]
    _cols = ["zcmb", "zhel", "mag", "mag_err"]
    _sep = ","

    def configure(self):
        self.pre_vars = self.mag_err**2
