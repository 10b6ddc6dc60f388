"""SDSS DR12 consensus BAO+FS (Alam et al. 2016).

Requires the installed ``bao_data`` package (cobaya-tpu install).
Reference: cobaya/likelihoods/bao/sdss_dr12_consensus_final.yaml.
"""

from ..base_classes.bao import BAO


class sdss_dr12_consensus_final(BAO):
    measurements_file = 'bao_data/sdss_DR12Consensus_final.dat'
    cov_file = 'bao_data/final_consensus_covtot_dM_Hz_fsig.txt'
    rs_fid = 147.78
    aliases = ["BAO"]
    speed = 2000
