"""DES Y1 clustering likelihood (arXiv:1708.01530).

Reference: cobaya/likelihoods/des_y1/clustering.py.  Requires the des_data
package (cobaya-tpu install).
"""

from ..base_classes.des import DES
from . import nuisance as nu


class clustering(DES):
    dataset_file = "DES_1YR_final.dataset"
    dataset_params = {"used_data_types": "wtheta"}
    aliases = ["des_clustering"]
    speed = 30
    params = nu.params_lens
