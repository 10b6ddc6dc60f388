"""SDSS DR12 consensus BAO (Alam et al. 2016, arXiv:1607.03155).

Requires the installed ``bao_data`` package (cobaya-tpu install).
"""

from ..base_classes.bao import BAO


class sdss_dr12_consensus_bao(BAO):
    measurements_file = "bao_data/sdss_DR12Consensus_bao.dat"
    cov_file = "bao_data/BAO_consensus_covtot_dM_Hz.txt"
    rs_fid = 147.78
    aliases = ["BAO"]
    speed = 2000
