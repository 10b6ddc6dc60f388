"""DESI DR2 BAO per-tracer likelihoods (arXiv:2503.14738).

Reference: cobaya/likelihoods/bao/desi_dr2/__init__.py (bao.desi_dr2
is an alias of desi_bao_all).
"""

from .desi_bao_all import desi_bao_all as desi_dr2


class desi_bao_bgs(desi_dr2):
    """DESI DR2 BAO for BGS_BRIGHT-21.35."""

    measurements_file = \
        "bao_data/desi_bao_dr2/desi_gaussian_bao_BGS_BRIGHT-21.35_GCcomb_z0.1-0.4_mean.txt"
    cov_file = \
        "bao_data/desi_bao_dr2/desi_gaussian_bao_BGS_BRIGHT-21.35_GCcomb_z0.1-0.4_cov.txt"

class desi_bao_lrg1(desi_dr2):
    """DESI DR2 BAO for LRG 0.4<z<0.6."""

    measurements_file = \
        "bao_data/desi_bao_dr2/desi_gaussian_bao_LRG_GCcomb_z0.4-0.6_mean.txt"
    cov_file = \
        "bao_data/desi_bao_dr2/desi_gaussian_bao_LRG_GCcomb_z0.4-0.6_cov.txt"

class desi_bao_lrg2(desi_dr2):
    """DESI DR2 BAO for LRG 0.6<z<0.8."""

    measurements_file = \
        "bao_data/desi_bao_dr2/desi_gaussian_bao_LRG_GCcomb_z0.6-0.8_mean.txt"
    cov_file = \
        "bao_data/desi_bao_dr2/desi_gaussian_bao_LRG_GCcomb_z0.6-0.8_cov.txt"

class desi_bao_lrg3pluselg1(desi_dr2):
    """DESI DR2 BAO for LRG+ELG_LOPnotqso."""

    measurements_file = \
        "bao_data/desi_bao_dr2/desi_gaussian_bao_LRG+ELG_LOPnotqso_GCcomb_z0.8-1.1_mean.txt"
    cov_file = \
        "bao_data/desi_bao_dr2/desi_gaussian_bao_LRG+ELG_LOPnotqso_GCcomb_z0.8-1.1_cov.txt"

class desi_bao_elg2(desi_dr2):
    """DESI DR2 BAO for ELG_LOPnotqso 1.1<z<1.6."""

    measurements_file = \
        "bao_data/desi_bao_dr2/desi_gaussian_bao_ELG_LOPnotqso_GCcomb_z1.1-1.6_mean.txt"
    cov_file = \
        "bao_data/desi_bao_dr2/desi_gaussian_bao_ELG_LOPnotqso_GCcomb_z1.1-1.6_cov.txt"

class desi_bao_qso(desi_dr2):
    """DESI DR2 BAO for QSO."""

    measurements_file = \
        "bao_data/desi_bao_dr2/desi_gaussian_bao_QSO_GCcomb_z0.8-2.1_mean.txt"
    cov_file = \
        "bao_data/desi_bao_dr2/desi_gaussian_bao_QSO_GCcomb_z0.8-2.1_cov.txt"

class desi_bao_lya(desi_dr2):
    """DESI DR2 BAO for Lya."""

    measurements_file = \
        "bao_data/desi_bao_dr2/desi_gaussian_bao_Lya_GCcomb_mean.txt"
    cov_file = \
        "bao_data/desi_bao_dr2/desi_gaussian_bao_Lya_GCcomb_cov.txt"
