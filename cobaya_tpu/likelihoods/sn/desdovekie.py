"""DES Dovekie SNIa sample (arXiv:2511.07517).

Reference: cobaya/likelihoods/sn/desdovekie.py.
"""

from ..base_classes.sn import PantheonPlusLike


class desdovekie(PantheonPlusLike):
    dataset_file = "Dovekie/config.dataset"
    aliases = ["DESDovekie"]
    use_abs_mag = False
    speed = 100

    _file_cols = ["idsurvey", "zhd", "zhel", "mu", "muerr",
                  "muerr_vpec", "muerr_sys", "probia_beams"]
    _cols = ["idsurvey", "zcmb", "zhel", "mag", "magerr",
             "magerr_vpec", "magerr_sys", "probia_beams"]
    _sep = ","

    def configure(self):
        self.pre_vars = 0.0
