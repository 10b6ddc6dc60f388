"""Union3 / UNITY1.5 binned SNIa sample (Rubin et al. 2023,
arXiv:2311.12098).

Reference: cobaya/likelihoods/sn/union3.py.
"""

from ..base_classes.sn import PantheonPlusLike


class union3(PantheonPlusLike):
    dataset_file = "Union3/full_long.dataset"
    aliases = ["Union3"]
    use_abs_mag = False
    speed = 100

    _file_cols = ["zcmb", "mb"]
    _cols = ["zcmb", "mag"]

    def configure(self):
        self.zhel = self.zcmb.copy()
        if "zhel" not in self.cols:
            self.cols.append("zhel")
        self.pre_vars = 0.0
