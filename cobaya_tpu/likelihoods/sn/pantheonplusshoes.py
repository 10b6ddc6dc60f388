"""Pantheon+ SNIa sample with SH0ES Cepheid calibrators (Brout et al.
2022, arXiv:2202.04077).

Reference: cobaya/likelihoods/sn/pantheonplusshoes.py -- calibrator
supernovae use the Cepheid host distances as the theory prediction.
"""

import numpy as np

from ..base_classes.sn import PantheonPlusLike


class pantheonplusshoes(PantheonPlusLike):
    bibtex_file = "pantheonplus.bibtex"
    dataset_file = "PantheonPlus/config.dataset"
    aliases = ["PantheonPlusSHOES"]
    use_abs_mag = False
    speed = 100

    _file_cols = ["m_b_corr", "zhd", "zhel", "is_calibrator",
                  "ceph_dist"]
    _cols = ["mag", "zcmb", "zhel", "is_calibrator", "ceph_dist"]

    def configure(self):
        self.is_calibrator = self.is_calibrator.astype(bool)
        self._apply_mask((self.zcmb > 0.01) | self.is_calibrator)
        self.pre_vars = 0.0

    def _apply_mask(self, zmask):
        super()._apply_mask(zmask)
        self.is_calibrator = self.is_calibrator.astype(bool)

    def alpha_beta_logp(self, lumdists, alpha=0, beta=0, Mb=0,
                        invcovmat=None):
        estimated_scriptm = Mb + 25 if self.use_abs_mag else 0.0
        lumdists = np.array(lumdists)
        # calibrators compare against Cepheid host distances
        lumdists[self.is_calibrator] = (
            self.ceph_dist[self.is_calibrator] - 25.0
        )
        diffmag = self.mag - lumdists - estimated_scriptm
        return -diffmag.dot(self.invcov).dot(diffmag) / 2.0
