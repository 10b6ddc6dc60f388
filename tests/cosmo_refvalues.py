"""Stored best-fit points and published chi^2 reference values.

Verbatim port of the reference test suite's stored-value tables:

- ``PARAMS_LOWTEB_HIGHTTTEEE`` / ``DERIVED_LOWTEB_HIGHTTTEEE``:
  /root/reference/tests/test_cosmo_quantities.py:22-86 (Planck 2015
  lowTEB+highTTTEEE best fit; derived values/sigmas in CAMB conventions).
- Planck 2018 chi^2: /root/reference/tests/test_cosmo_planck_2018.py
  (plik-lite values at the TT / TTTEEE best-fit points; CamSpec TT).
- BAO chi^2: /root/reference/tests/test_cosmo_bao.py:526-558.
- SN chi^2: /root/reference/tests/test_cosmo_sn.py:128-138.
- DES Y1 chi^2: /root/reference/tests/test_cosmo_des_y1.py:111-116.
- BICEP/Keck 2018: /root/reference/tests/test_cosmo_bicep_keck_2018.py:40.

These are physics-pinned constants (published analyses), not code: a
likelihood evaluated on the real released data at these points must
reproduce them or its data handling / math has a bug that synthetic
self-generated data cannot catch.
"""

# -- best-fit points ---------------------------------------------------------

# Planck 2015 lowTEB + highTTTEEE best fit (cosmology block; the plik
# nuisance block is only needed by the clik likelihoods, not ported here)
PARAMS_LOWTEB_HIGHTTTEEE = {
    "ombh2": 0.02225203,
    "omch2": 0.1198657,
    "H0": 67.25,
    "logA": 3.0929,
    "ns": 0.9647522,
    "tau": 0.07888604,
    "A_planck": 1.00029,
}

# derived: {name: [best_fit, sigma_planck2015]}
DERIVED_LOWTEB_HIGHTTTEEE = {
    "H0": [67.25, 0.66],
    "omegam": [0.3156, 0.0091],
    "sigma8": [0.8310, 0.013],
    "age": [13.8133, 0.026],
    "zstar": [1090.057, 0.30],
    "rstar": [144.556, 0.32],
    "thetastar": [1.040967, 0.00032],
    "zdrag": [1059.666, 0.31],
    "rdrag": [147.257, 0.31],
}

# Planck 2018 TT best fit (reference test_cosmo_planck_2018.py:402-415)
PARAMS_LOWL_HIGHTT_LITE = {
    "ombh2": 0.02240,
    "omch2": 0.1172,
    "H0": 68.45,
    "tau": 0.0862,
    "logA": 3.100,
    "ns": 0.9733,
    "A_planck": 1.00008,
}

# Planck 2018 TTTEEE best fit (reference test_cosmo_planck_2018.py:480-494)
PARAMS_LOWTE_HIGHTTTEEE_LITE = {
    "ombh2": 0.022383,
    "omch2": 0.12011,
    "H0": 67.32,
    "tau": 0.0543,
    "logA": 3.0448,
    "ns": 0.96605,
    "A_planck": 1.00044,
}

# CamSpec TT best fit: cosmology of PARAMS_LOWL_HIGHTT_LITE + foregrounds
# (reference test_cosmo_planck_2018.py:566-593)
PARAMS_T_CAMSPEC = dict(PARAMS_LOWL_HIGHTT_LITE, **{
    "aps100": 238.7887,
    "aps143": 41.31762,
    "aps217": 100.6226,
    "acib217": 44.96003,
    "asz143": 5.886124,
    "psr": 0.5820399,
    "cibr": 0.7912195,
    "ncib": 0.0,
    "cibrun": 0.0,
    "xi": 0.1248677,
    "aksz": 1.153473,
    "dust100": 1.010905,
    "dust143": 0.9905765,
    "dust217": 0.9658913,
    "dust143x217": 0.9946434,
    "cal0": 0.9975484,
    "cal2": 1.00139,
    "calTE": 1.0,
    "calEE": 1.0,
})

# -- stored chi^2 ------------------------------------------------------------

CHI2_PLIKLITE_TT = {"planck_2018_highl_plik.TT_lite_native": 204.36,
                    "tolerance": 0.11}
CHI2_PLIKLITE_TTTEEE = {"planck_2018_highl_plik.TTTEEE_lite_native": 584.24,
                        "tolerance": 0.11}
CHI2_CAMSPEC_TT = {"planck_2018_highl_CamSpec.TT": 7057.99, "tolerance": 0.2}
CHI2_LOWL_TT = {"planck_2018_lowl.TT": 23.16, "tolerance": 0.11}
CHI2_LOWL_EE = {"planck_2018_lowl.EE": 396.04, "tolerance": 0.11}

CHI2_BAO = {
    "bao.sdss_dr12_consensus_bao": (5.687, 0.04),
    "bao.sdss_dr12_consensus_full_shape": (8.154, 0.02),
    "bao.sdss_dr12_consensus_final": (8.051, 0.03),
    "bao.sixdf_2011_bao": (0.088, 0.02),
    "bao.sdss_dr7_mgs": (0.92689, 0.02),
    "bao.sdss_dr16_baoplus_elg": (3.24, 0.06),
    "bao.sdss_dr16_bao_elg": (0.37, 0.06),
    "bao.sdss_dr16_baoplus_lrg": (5.96, 0.04),
    "bao.sdss_dr16_lrg_bao_dmdh": (3.29, 0.04),
    "bao.sdss_dr12_lrg_bao_dmdh": (2.95, 0.04),
    "bao.sdss_dr16_baoplus_qso": (8.78, 0.04),
    "bao.sdss_dr16_qso_bao_dmdh": (0.54, 0.04),
    "bao.sdss_dr16_baoplus_lyauto": (1.74, 0.04),
    "bao.sdss_dr16_baoplus_lyxqso": (3.24, 0.04),
    "bao.desi_2024_bao_all": (21.37, 0.02),
    "bao.desi_dr2": (30.48, 0.02),
    "bao.desi_dr2.desi_bao_elg2": (2.24, 0.01),
}

CHI2_SN = {
    "sn.pantheon": (1035.30, 0.1),
    "sn.jla": (700.582, 0.1),
    "sn.jla_lite": (706.882, 0.1),
    "sn.pantheonplus": (1403.69, 0.1),
    "sn.pantheonplusshoes": (1496.97, 0.1),
    "sn.union3": (26.31, 0.1),
    "sn.desy5": (1644.94, 0.1),
    "sn.desdovekie": (1632.35, 0.1),
}

# sn.pantheon with use_abs_mag + H0.riess2020Mb
CHI2_SN_PANTHEON_MB = {"sn.pantheon": 4025.30, "H0.riess2020Mb": 1.65,
                       "tolerance": 0.1}

CHI2_DES_Y1 = {
    "des_y1.shear": (242.825, 0.2),
    "des_y1.clustering": (100.78, 0.2),
    "des_y1.galaxy_galaxy": (208.005, 0.2),
    "des_y1.joint": (570.428, 0.2),
}

# DES Y1 nuisance best fit (reference test_cosmo_des_y1.py:118-160)
DES_NUISANCE = {
    "DES_DzS1": 0.002, "DES_DzS2": -0.015, "DES_DzS3": 0.007,
    "DES_DzS4": -0.018,
    "DES_m1": 0.012, "DES_m2": 0.012, "DES_m3": 0.012, "DES_m4": 0.012,
    "DES_AIA": 1.0, "DES_alphaIA": 1.0,
    "DES_DzL1": 0.002, "DES_DzL2": 0.001, "DES_DzL3": 0.003,
    "DES_DzL4": 0.0, "DES_DzL5": 0.0,
    "DES_b1": 1.45, "DES_b2": 1.55, "DES_b3": 1.65, "DES_b4": 1.8,
    "DES_b5": 2.0,
}

CHI2_BICEP_KECK_2018 = {"bicep_keck_2018": 543.25, "tolerance": 0.1}

# BK18 best fit (reference test_cosmo_bicep_keck_2018.py:42-60)
PARAMS_BK18 = {
    "ombh2": 0.2235620e-01,
    "omch2": 0.1204042e00,
    "H0": 0.6718506e02,
    "tau": 0.5454114e-01,
    "logA": 0.3046322e01,
    "ns": 0.9654113e00,
    "r": 0.1451578e-01,
    "calPlanck": 0.1000689e01,
    "BBdust": 0.4648994e01,
    "BBsync": 0.1542620e01,
    "BBalphadust": -0.5338430e00,
    "BBbetadust": 0.1576173e01,
    "BBalphasync": -0.1915241e00,
    "BBbetasync": -0.3040606e01,
    "BBdustsynccorr": -0.3441905e00,
}

# -- H0/Mb point likelihoods (data-light: always testable) -------------------
# (mean, std) pinned in each class; reference test_cosmo_H0.py evaluates at
# a fiducial and checks the analytic Gaussian chi^2
H0_LIKELIHOODS = ["H0.riess2018a", "H0.riess2018b", "H0.riess201903",
                  "H0.riess2020", "H0.freedman2020"]
FIDUCIAL_H0, FIDUCIAL_H0_STD = 70.0, 1.0
FIDUCIAL_MB, FIDUCIAL_MB_STD = -19.2, 0.1
