"""DESI DR2 BAO, all tracers (arXiv:2503.14738).

Reference: cobaya/likelihoods/bao/desi_dr2/desi_bao_all.yaml.
"""

from ...base_classes.bao import BAO


class desi_bao_all(BAO):
    bibtex_file = "desi_dr2.bibtex"
    measurements_file = \
        "bao_data/desi_bao_dr2/desi_gaussian_bao_ALL_GCcomb_mean.txt"
    cov_file = "bao_data/desi_bao_dr2/desi_gaussian_bao_ALL_GCcomb_cov.txt"
    rs_fid = 1
    aliases = ["BAO"]
    speed = 2000
