"""DES Y1 shear likelihood (arXiv:1708.01530).

Reference: cobaya/likelihoods/des_y1/shear.py.  Requires the des_data
package (cobaya-tpu install).
"""

from ..base_classes.des import DES
from . import nuisance as nu


class shear(DES):
    dataset_file = "DES_1YR_final.dataset"
    dataset_params = {"used_data_types": "xip xim"}
    aliases = ["des_shear"]
    speed = 30
    params = nu.params_source
