"""DES Y1 galaxy_galaxy likelihood (arXiv:1708.01530).

Reference: cobaya/likelihoods/des_y1/galaxy_galaxy.py.  Requires the des_data
package (cobaya-tpu install).
"""

from ..base_classes.des import DES
from . import nuisance as nu


class galaxy_galaxy(DES):
    dataset_file = "DES_1YR_final.dataset"
    dataset_params = {"used_data_types": "gammat"}
    aliases = ["des_galaxy_galaxy"]
    speed = 30
    params = nu.params_joint
