"""SDSS DR12 consensus full-shape (Alam et al. 2016).

Requires the installed ``bao_data`` package (cobaya-tpu install).
Reference: cobaya/likelihoods/bao/sdss_dr12_consensus_full_shape.yaml.
"""

from ..base_classes.bao import BAO


class sdss_dr12_consensus_full_shape(BAO):
    measurements_file = 'bao_data/sdss_DR12Consensus_FS.dat'
    cov_file = 'bao_data/FS_consensus_covtot_dM_Hz_fsig.txt'
    rs_fid = 147.78
    aliases = ["BAO"]
    speed = 2000
