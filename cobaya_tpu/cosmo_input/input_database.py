"""Declarative database of cosmological model/dataset building blocks.

Capability parity with
/root/reference/cobaya/cosmo_input/input_database.py (1142 LoC): per-field
dictionaries (primordial, geometry, hubble, matter, neutrinos, dark_energy,
bbn, reionization) with per-theory parameter blocks, likelihood combos
(CMB / BAO / DES / SN / H0), recommended sampler settings, and named presets
consumed by :func:`cosmo_input.create_input.create_input`.

The parameter priors/refs/latex labels follow the published Planck/DES/DESI
analysis conventions (the same ones the reference encodes); the composition
here is programmatic — shared parameter specs are built once by helpers and
extended per variant instead of repeated.
"""

from __future__ import annotations

from copy import deepcopy

none = "none"
error_msg = "error_msg"

H0_MIN, H0_MAX = 20, 100
N_EFF_STD = 3.044
NU_MASS_FAC = 94.0708

theory: dict = {"camb": None, "classy": None}


def _p(pmin, pmax, ref_loc, ref_scale, proposal, latex, **extra) -> dict:
    """Sampled-parameter spec with a flat prior."""
    spec = {
        "prior": {"min": pmin, "max": pmax},
        "ref": {"dist": "norm", "loc": ref_loc, "scale": ref_scale},
        "proposal": proposal, "latex": latex,
    }
    spec.update(extra)
    return spec


def _pnorm(loc, scale, ref_loc, ref_scale, proposal, latex, **extra) -> dict:
    """Sampled-parameter spec with a Gaussian prior."""
    spec = {
        "prior": {"dist": "norm", "loc": loc, "scale": scale},
        "ref": {"dist": "norm", "loc": ref_loc, "scale": ref_scale},
        "proposal": proposal, "latex": latex,
    }
    spec.update(extra)
    return spec


# --- model building blocks ---------------------------------------------------

def _sfsr_params(ref_scale_logA=0.001, proposal_logA=0.001) -> dict:
    return {
        "logA": _p(1.61, 3.91, 3.05, ref_scale_logA, proposal_logA,
                   r"\log(10^{10} A_\mathrm{s})", drop=True),
        "As": {"value": "lambda logA: 1e-10*np.exp(logA)",
               "latex": r"A_\mathrm{s}"},
        "ns": _p(0.8, 1.2, 0.965, 0.004, 0.002, r"n_\mathrm{s}"),
    }


_NRUN = _p(-1, 1, 0, 0.005, 0.001, r"n_\mathrm{run}")
_NRUNRUN = _p(-1, 1, 0, 0.002, 0.001, r"n_\mathrm{run,run}")
_R_TENSOR = _p(0, 3, 0, 0.03, 0.03, r"r_{0.05}")
# inflation-consistency tensor tilt: CAMB computes nt, CLASS uses 'scc'
_TENSOR_THEORY = {
    "camb": {"extra_args": {"nt": None}},
    "classy": {"extra_args": {"n_t": "scc", "alpha_t": "scc"}},
}

primordial: dict = {
    none: {},
    "SFSR": {
        "desc": "Adiabatic scalar perturbations, power law spectrum",
        "theory": theory,
        "params": _sfsr_params(),
    },
    "SFSR_DESpriors": {
        "desc": "Adiabatic scalar perturbations, power law - DES priors",
        "theory": theory,
        "params": {
            "As_1e9": _p(0.5, 5, 2.1, 0.5, 0.25, r"10^9 A_\mathrm{s})",
                         drop=True, renames="A"),
            "As": {"value": "lambda As_1e9: 1e-9 * As_1e9",
                   "latex": r"A_\mathrm{s}"},
            "ns": _p(0.87, 1.07, 0.965, 0.05, 0.002, r"n_\mathrm{s}"),
        },
    },
    "SFSR_lenspriors": {
        "desc": "Adiabatic scalar perturbations, power law -- "
                "Planck lensing priors",
        "theory": theory,
        "params": dict(
            _sfsr_params(ref_scale_logA=0.01, proposal_logA=0.005),
            ns=_pnorm(0.96, 0.02, 0.965, 0.02, 0.002, r"n_\mathrm{s}"),
        ),
    },
    "SFSR_run": {
        "desc": "Adiabatic scalar perturbations, power law + running "
                "spectrum",
        "theory": theory,
        "params": dict(_sfsr_params(), nrun=_NRUN),
    },
    "SFSR_runrun": {
        "desc": "Adiabatic scalar perturbations, power law + 2nd-order "
                "running spectrum",
        "theory": theory,
        "params": dict(_sfsr_params(), nrun=_NRUN, nrunrun=_NRUNRUN),
    },
    "SFSR_t": {
        "desc": "Adiabatic scalar+tensor perturbations, power law spectrum "
                "(inflation consistency)",
        "theory": _TENSOR_THEORY,
        "params": dict(_sfsr_params(), r=_R_TENSOR),
    },
    "SFSR_t_nrun": {
        "desc": "Adiabatic scalar+tensor perturbations, power law + running "
                "spectrum (inflation consistency)",
        "theory": _TENSOR_THEORY,
        "params": dict(_sfsr_params(), nrun=_NRUN, r=_R_TENSOR),
    },
}

geometry: dict = {
    none: {},
    "flat": {"desc": "Flat FLRW universe",
             "theory": theory},
    "omegak": {
        "desc": "FLRW model with varying curvature (prior [-0.3, 0.3])",
        "theory": theory,
        "params": {
            "omegak": _p(-0.3, 0.3, -0.009, 0.001, 0.001, r"\Omega_k"),
        },
    },
}


def _theta_mc_params(ref_scale, proposal, h0_min) -> dict:
    return {
        "theta_MC_100": _p(0.5, 10, 1.04109, ref_scale, proposal,
                           r"100\theta_\mathrm{MC}", drop=True,
                           renames="theta"),
        "cosmomc_theta": {
            "value": "lambda theta_MC_100: 1.e-2*theta_MC_100",
            "derived": False,
        },
        "H0": {"latex": r"H_0", "min": h0_min, "max": H0_MAX},
    }


hubble: dict = {
    none: {},
    "H": {
        "desc": "Hubble parameter",
        "theory": theory,
        "params": {
            "H0": _p(H0_MIN, H0_MAX, 67, 2, 2, r"H_0"),
        },
    },
    "H_DESpriors": {
        "desc": "Hubble parameter (reduced range for DES and lensing-only "
                "constraints)",
        "theory": theory,
        "params": {
            "H0": _p(55, 91, 67, 2, 2, r"H_0"),
        },
    },
    "sound_horizon_last_scattering": {
        "desc": "Angular size of the sound horizon at last scattering "
                "(approximate, if using CAMB)",
        "theory": {
            "camb": {
                "params": _theta_mc_params(0.0004, 0.0002, H0_MIN),
                "extra_args": {"theta_H0_range": [H0_MIN, H0_MAX]},
            },
            "classy": {
                "params": {
                    "theta_s_100": _p(0.5, 10, 1.0416, 0.0004, 0.0002,
                                      r"100\theta_\mathrm{s}"),
                    "H0": {"latex": r"H_0"},
                },
            },
        },
    },
    "sound_horizon_lensonly": {
        "desc": "Angular size of the sound horizon (h>0.4; approximate, "
                "if using CAMB)",
        "theory": {
            "camb": {
                "params": _theta_mc_params(0.002, 0.001, 40),
                "extra_args": {"theta_H0_range": [40, H0_MAX]},
            },
        },
    },
}

matter: dict = {
    none: {},
    "omegab_h2, omegac_h2": {
        "desc": "Flat prior on Omega*h^2 for baryons and cold dark matter",
        "theory": theory,
        "params": {
            "omegabh2": _p(0.005, 0.1, 0.0224, 0.0001, 0.0001,
                           r"\Omega_\mathrm{b} h^2"),
            "omegach2": _p(0.001, 0.99, 0.12, 0.001, 0.0005,
                           r"\Omega_\mathrm{c} h^2"),
            "omegam": {"latex": r"\Omega_\mathrm{m}"},
        },
    },
    "Omegab, Omegam": {
        "desc": "Flat prior on Omega for baryons and total matter",
        "theory": theory,
        "params": {
            "omegab": _p(0.03, 0.07, 0.0495, 0.004, 0.004,
                         r"\Omega_\mathrm{b}", drop=True),
            "omegam": _p(0.1, 0.9, 0.316, 0.02, 0.02,
                         r"\Omega_\mathrm{m}", drop=True),
            "omegabh2": {
                "value": "lambda omegab, H0: omegab*(H0/100)**2",
                "latex": r"\Omega_\mathrm{b} h^2",
            },
            "omegach2": {
                "value": (
                    "lambda omegam, omegab, mnu, H0: "
                    "(omegam-omegab)*(H0/100)**2"
                    f"-(mnu*({N_EFF_STD:g}/3)**0.75)/{NU_MASS_FAC:g}"
                ),
                "latex": r"\Omega_\mathrm{c} h^2",
            },
        },
    },
    "omegab_h2_lenspriors": {
        "desc": "BBN-like prior on Omega*h^2 for baryons, with cold dark "
                "matter",
        "theory": theory,
        "params": {
            "omegabh2": _pnorm(0.0222, 0.0005, 0.0222, 0.0005, 0.0004,
                               r"\Omega_\mathrm{b} h^2"),
            "omegach2": _p(0.001, 0.99, 0.12, 0.003, 0.002,
                           r"\Omega_\mathrm{c} h^2"),
            "omegam": {"latex": r"\Omega_\mathrm{m}"},
        },
    },
}

for _m in matter.values():
    if _m:
        _m["params"]["omegamh2"] = {
            "derived": "lambda omegam, H0: omegam*(H0/100)**2",
            "latex": r"\Omega_\mathrm{m} h^2",
        }

_MNU_VARYING_CAMB = _p(0, 5, 0.02, 0.1, 0.03, r"\sum m_\nu")
_NNU_VARYING = _p(0.05, 10, N_EFF_STD, 0.05, 0.05, r"N_\mathrm{eff}")

neutrinos: dict = {
    none: {},
    "one_heavy_planck": {
        "desc": "Two massless nu and one with m=0.06. Neff=3.044",
        "theory": {
            "camb": {
                "extra_args": {"num_massive_neutrinos": 1, "nnu": N_EFF_STD},
                "params": {"mnu": 0.06},
            },
            "classy": {
                "extra_args": {"N_ncdm": 1, "N_ur": 2.0328},
                "params": {"m_ncdm": {"value": 0.06, "renames": "mnu"}},
            },
        },
    },
    "varying_mnu": {
        "desc": "Varying total mass of 3 degenerate nu's, with N_eff=3.044",
        "theory": {
            "camb": {
                "extra_args": {"num_massive_neutrinos": 3, "nnu": N_EFF_STD},
                "params": {"mnu": _MNU_VARYING_CAMB},
            },
            "classy": {
                "extra_args": {"N_ncdm": 1, "deg_ncdm": 3, "N_ur": 0.00641},
                "params": {
                    "m_ncdm": _p(0, 1.667, 0.0067, 0.033, 0.01, r"m_\nu"),
                    "mnu": {"derived": "lambda m_ncdm: 3 * m_ncdm",
                            "latex": r"\sum m_\nu"},
                },
            },
        },
    },
    "varying_Neff": {
        "desc": "Varying Neff with two massless nu and one with m=0.06",
        "theory": {
            "camb": {
                "extra_args": {"num_massive_neutrinos": 1},
                "params": {"mnu": 0.06, "nnu": _NNU_VARYING},
            },
            "classy": {
                "extra_args": {"N_ncdm": 1},
                "params": {
                    "m_ncdm": {"value": 0.06, "renames": "mnu"},
                    "N_ur": _p(0.0001, 9, 2.0328, 0.05, 0.05,
                               r"N_\mathrm{ur}"),
                    "nnu": {"derived": "lambda Neff: Neff",
                            "latex": r"N_\mathrm{eff}"},
                },
            },
        },
    },
    "varying_mnu_Neff": {
        "desc": "Varying Neff and total mass of 3 degenerate nu's",
        "theory": {
            "camb": {
                "extra_args": {"num_massive_neutrinos": 3},
                "params": {"mnu": _MNU_VARYING_CAMB, "nnu": _NNU_VARYING},
            },
        },
    },
}

dark_energy: dict = {
    none: {},
    "lambda": {
        "desc": "Cosmological constant (w=-1)",
        "theory": theory,
        "params": {"omegal": {"latex": r"\Omega_\Lambda"}},
    },
    "de_w": {
        "desc": "Varying constant eq of state",
        "theory": {"camb": None,
                   "classy": {"params": {"Omega_Lambda": 0}}},
        "params": {
            "w": _p(-3, -0.333, -0.99, 0.02, 0.02, r"w_\mathrm{DE}"),
        },
    },
    "de_w_wa": {
        "desc": "Varying constant eq of state with w(a) = w0 + (1-a) wa",
        "theory": {"camb": {"extra_args": {"dark_energy_model": "ppf"}},
                   "classy": {"params": {"Omega_Lambda": 0}}},
        "params": {
            "w": _p(-3, 1, -0.99, 0.02, 0.02, r"w_{0,\mathrm{DE}}"),
            "wa": _p(-3, 2, 0, 0.05, 0.05, r"w_{a,\mathrm{DE}}"),
        },
    },
}

bbn_derived_camb: dict = {
    "YpBBN": {"latex": r"Y_P^\mathrm{BBN}"},
    "DHBBN": {"derived": "lambda DH: 10**5*DH",
              "latex": r"10^5 \mathrm{D}/\mathrm{H}"},
}

bbn: dict = {
    none: {},
    "consistency": {
        "desc": "Primordial Helium fraction inferred from BBN consistency",
        "theory": {"camb": {"params": bbn_derived_camb}, "classy": None},
        "params": {"yheused": {"latex": r"Y_\mathrm{P}"}},
    },
    "YHe_des_y1": {
        "desc": "Fixed Y_P = 0.245341 (used in DES Y1)",
        "theory": theory,
        "params": {"yhe": 0.245341},
    },
    "YHe": {
        "desc": "Varying primordial Helium fraction",
        "theory": theory,
        "params": {
            "yhe": _p(0.1, 0.5, 0.237, 0.006, 0.006, r"Y_\mathrm{P}"),
        },
    },
}

reionization: dict = {
    none: {},
    "std": {
        "desc": "Standard reio, lasting delta_z=0.5",
        "theory": theory,
        "params": {
            "tau": _p(0.01, 0.8, 0.055, 0.006, 0.003,
                      r"\tau_\mathrm{reio}"),
            "zrei": {"latex": r"z_\mathrm{re}"},
        },
    },
    "gauss_prior": {
        "desc": "Standard reio, lasting delta_z=0.5, gaussian prior around "
                "tau=0.07",
        "theory": theory,
        "params": {
            "tau": _pnorm(0.07, 0.02, 0.07, 0.01, 0.005,
                          r"\tau_\mathrm{reio}"),
            "zrei": {"latex": r"z_\mathrm{re}"},
        },
    },
    "irrelevant": {
        "desc": "Irrelevant (NB: only valid for non-CMB or CMB-marged "
                "datasets!)",
        "theory": theory,
        "params": {},
    },
}

# --- experiments -------------------------------------------------------------

# precision settings for plain background / CMB / CMB+LSS analyses
base_precision: dict = {"camb": {}, "classy": {}}
cmb_precision = deepcopy(base_precision)
cmb_precision["classy"].update({"non linear": "hmcode"})
cmb_lss_precision = deepcopy(cmb_precision)
cmb_lss_precision["classy"].update({"nonlinear_min_k_max": 20})

default_mcmc_options = {
    "proposal_scale": 1.9,
    "Rminus1_stop": 0.01,
    "Rminus1_cl_stop": 0.2,
}
cmb_sampler_recommended: dict = {
    "mcmc": dict(drag=True, oversample_power=0.4, **default_mcmc_options),
}
cmb_sampler_mcmc: dict = {"mcmc": dict(drag=False, **default_mcmc_options)}


def _cmb_theory(precision) -> dict:
    return {theo: {"extra_args": precision[theo]}
            for theo in ("camb", "classy")}


like_cmb: dict = {
    none: {},
    "planck_NPIPE_CamSpec": {
        "desc": "Planck NPIPE CamSpec (native; polarized NPIPE CMB + "
                "lensing)",
        "sampler": cmb_sampler_recommended,
        "theory": _cmb_theory(cmb_precision),
        "likelihood": {
            "planck_2018_lowl.TT": None,
            "planck_2018_lowl.EE": None,
            "planck_NPIPE_highl_CamSpec.TTTEEE": None,
            "planckpr4lensing": {
                "package_install": {
                    "github_repository": "carronj/planck_PR4_lensing",
                    "min_version": "1.0.2",
                },
            },
        },
    },
    "planck_NPIPE_Hillipop": {
        "desc": "Planck NPIPE Hillipop+Lollipop (polarized NPIPE CMB + "
                "lensing)",
        "sampler": cmb_sampler_recommended,
        "theory": _cmb_theory(cmb_precision),
        "likelihood": {
            "planck_2018_lowl.TT": None,
            "planck_2020_lollipop.lowlE": {
                "package_install": {
                    "pip": "planck-npipe/lollipop",
                    "min_version": "4.1.1",
                },
            },
            "planck_2020_hillipop.TTTEEE": {
                "package_install": {
                    "pip": "planck-npipe/hillipop",
                    "min_version": "4.2.2",
                },
            },
            "planckpr4lensing": {
                "package_install": {
                    "github_repository": "carronj/planck_PR4_lensing",
                    "min_version": "1.0.2",
                },
            },
        },
    },
    "planck_2018": {
        "desc": "Planck 2018 (Polarized CMB + lensing)",
        "sampler": cmb_sampler_recommended,
        "theory": _cmb_theory(cmb_precision),
        "likelihood": {
            "planck_2018_lowl.TT": None,
            "planck_2018_lowl.EE": None,
            "planck_2018_highl_plik.TTTEEE": None,
            "planck_2018_lensing.clik": None,
        },
    },
    "planck_2018_plik_lite": {
        "desc": "Planck 2018 TT,TE,EE (plik-lite, all native Python) + "
                "lowl + lensing",
        "sampler": cmb_sampler_recommended,
        "theory": _cmb_theory(cmb_precision),
        "likelihood": {
            "planck_2018_lowl.TT": None,
            "planck_2018_lowl.EE": None,
            "planck_2018_highl_plik.TTTEEE_lite": None,
            "planck_2018_lensing.clik": None,
        },
    },
    "planck_2018_bk18": {
        "desc": "Planck 2018 (Polarized CMB + lensing) + Bicep/Keck-Array "
                "2018",
        "sampler": cmb_sampler_recommended,
        "theory": _cmb_theory(cmb_precision),
        "likelihood": {
            "planck_2018_lowl.TT": None,
            "planck_2018_lowl.EE": None,
            "planck_2018_highl_plik.TTTEEE": None,
            "planck_2018_lensing.clik": None,
            "bicep_keck_2018": None,
        },
    },
    "planck_2018_CMBmarged_lensing": {
        "desc": "Planck 2018 CMB-marginalized lensing only",
        "sampler": cmb_sampler_mcmc,
        "theory": _cmb_theory(cmb_precision),
        "likelihood": {"planck_2018_lensing.CMBMarged": None},
    },
}

# common CMB derived parameters, added to every non-empty CMB combo
derived_params: dict = {
    "sigma8": {"latex": r"\sigma_8"},
    "s8h5": {
        "derived": "lambda sigma8, H0: sigma8*(H0*1e-2)**(-0.5)",
        "latex": r"\sigma_8/h^{0.5}",
    },
    "s8omegamp5": {
        "derived": "lambda sigma8, omegam: sigma8*omegam**0.5",
        "latex": r"\sigma_8 \Omega_\mathrm{m}^{0.5}",
    },
    "s8omegamp25": {
        "derived": "lambda sigma8, omegam: sigma8*omegam**0.25",
        "latex": r"\sigma_8 \Omega_\mathrm{m}^{0.25}",
    },
    "A": {"derived": "lambda As: 1e9*As", "latex": r"10^9 A_\mathrm{s}"},
    "clamp": {
        "derived": "lambda As, tau: 1e9*As*np.exp(-2*tau)",
        "latex": r"10^9 A_\mathrm{s} e^{-2\tau}",
    },
    "age": {"latex": r"{\rm{Age}}/\mathrm{Gyr}"},
    "rdrag": {"latex": r"r_\mathrm{drag}"},
}
for _name, _m in like_cmb.items():
    if not _m:
        continue
    _m.setdefault("params", {}).update(derived_params)
    if "cmbmarged" in _name.lower():
        # amplitude-like derived params are meaningless once the CMB
        # spectra have been marginalized out
        _m["params"].pop("A")
        _m["params"].pop("clamp")

like_bao: dict = {
    none: {},
    "BAO_desi_dr2": {
        "desc": "Combined BAO from DESI DR2",
        "theory": theory,
        "likelihood": {"bao.desi_dr2": None},
    },
    "BAO_desi_2024": {
        "desc": "Combined BAO from DESI 2024",
        "theory": theory,
        "likelihood": {"bao.desi_2024_bao_all": None},
    },
    "BAO_planck_2018": {
        "desc": "Baryon acoustic oscillation data from DR12, MGS and 6DF "
                "(Planck 2018 papers)",
        "theory": theory,
        "likelihood": {
            "bao.sixdf_2011_bao": None,
            "bao.sdss_dr7_mgs": None,
            "bao.sdss_dr12_consensus_bao": None,
        },
    },
    "BAO_planck_latest": {
        "desc": "Baryon acoustic oscillation data from BOSS DR12, "
                "eBOSS DR16, MGS and 6DF",
        "theory": theory,
        "likelihood": {
            "bao.sixdf_2011_bao": None,
            "bao.sdss_dr7_mgs": None,
            "bao.sdss_dr16_baoplus_lrg": None,
            "bao.sdss_dr16_baoplus_elg": None,
            "bao.sdss_dr16_baoplus_qso": None,
            "bao.sdss_dr16_baoplus_lyauto": None,
            "bao.sdss_dr16_baoplus_lyxqso": None,
        },
    },
}

like_des: dict = {
    none: {},
    "des_y1_clustering": {
        "desc": "Galaxy clustering from DES Y1",
        "likelihood": {"des_y1.clustering": None},
    },
    "des_y1_galaxy_galaxy": {
        "desc": "Galaxy-galaxy lensing from DES Y1",
        "likelihood": {"des_y1.galaxy_galaxy": None},
    },
    "des_y1_shear": {
        "desc": "Cosmic shear data from DES Y1",
        "likelihood": {"des_y1.shear": None},
    },
    "des_y1_joint": {
        "desc": "Combination of galaxy clustering and weak lensing data "
                "from DES Y1",
        "likelihood": {"des_y1.joint": None},
    },
}
for _k, _v in like_des.items():
    if _k is not none:
        _v["theory"] = _cmb_theory(cmb_lss_precision)
        _v["sampler"] = cmb_sampler_recommended

like_sn: dict = {
    none: {},
    "PantheonPlus": {
        "desc": "Supernovae data from the Pantheon+ sample",
        "theory": theory,
        "likelihood": {"sn.pantheonplus": None},
    },
    "Union3": {
        "desc": "Supernovae data from Union3",
        "theory": theory,
        "likelihood": {"sn.union3": None},
    },
    "DESY5": {
        "desc": "Supernovae data from the DES Y5 sample",
        "theory": theory,
        "likelihood": {"sn.desy5": None},
    },
    "DESDovekie": {
        "desc": "Supernovae data from the updated DES-Dovekie Y5 sample",
        "theory": theory,
        "likelihood": {"sn.desdovekie": None},
    },
    "Pantheon": {
        "desc": "Supernovae data from the Pantheon sample",
        "theory": theory,
        "likelihood": {"sn.pantheon": None},
    },
}

like_H0: dict = {
    none: {},
    "Riess2018a": {
        "desc": "Local H0 measurement from Riess et al. 2018a (used in "
                "Planck 2018)",
        "theory": theory,
        "likelihood": {"H0.riess2018a": None},
    },
    "Riess201903": {
        "desc": "Local H0 measurement from Riess et al. 2019",
        "theory": theory,
        "likelihood": {"H0.riess201903": None},
    },
    "Riess2020": {
        "desc": "Local H0 measurement from Riess et al. 2020",
        "theory": theory,
        "likelihood": {"H0.riess2020": None},
    },
    "Freedman2020": {
        "desc": "Local H0 measurement from Freedman et al. 2020",
        "theory": theory,
        "likelihood": {"H0.freedman2020": None},
    },
    "Riess2020Mb": {
        "desc": "Local magnitude measurement as from Riess et al. 2020",
        "theory": theory,
        "likelihood": {"H0.riess2020Mb": None,
                       "sn.pantheon": {"use_abs_mag": True}},
    },
}

# --- samplers ----------------------------------------------------------------

sampler: dict = {
    "MCMC": {
        "desc": "MCMC sampler with covmat learning",
        "sampler": {"mcmc": {"covmat": "auto"}},
    },
    "MCMC dragging": {
        "desc": "MCMC fast-dragging sampler with covmat learning",
        "sampler": {"mcmc": {"drag": True, "oversample_power": 0.4,
                             "proposal_scale": 1.9, "covmat": "auto"}},
    },
    "PolyChord": {
        "desc": "Nested sampler, affine invariant and multi-modal",
        "sampler": {"polychord": None},
    },
}

# --- presets -----------------------------------------------------------------

planck_base_model = {
    "primordial": "SFSR",
    "geometry": "flat",
    "hubble": "sound_horizon_last_scattering",
    "matter": "omegab_h2, omegac_h2",
    "neutrinos": "one_heavy_planck",
    "dark_energy": "lambda",
    "bbn": "consistency",
    "reionization": "std",
}
default_sampler = {"sampler": "MCMC dragging"}


def _preset(desc, theo, **fields) -> dict:
    """Planck-baseline preset: fill unstated model fields from the base."""
    pre = {"desc": desc, "theory": theo, **fields}
    for field, value in planck_base_model.items():
        pre.setdefault(field, value)
    return pre


preset: dict = {
    none: {"desc": "(No preset chosen)"},
    # pure CMB
    "planck_NPIPE_CamSpec_camb": _preset(
        "Planck NPIPE CamSpec with CAMB (all native Python)", "camb",
        like_cmb="planck_NPIPE_CamSpec"),
    "planck_NPIPE_CamSpec_classy": _preset(
        "Planck NPIPE CamSpec with CLASS (all native Python)", "classy",
        like_cmb="planck_NPIPE_CamSpec"),
    "planck_NPIPE_Hillipop_camb": _preset(
        "Planck NPIPE Hillipop+Lollipop with CAMB (all native Python)",
        "camb", like_cmb="planck_NPIPE_Hillipop"),
    "planck_NPIPE_Hillipop_classy": _preset(
        "Planck NPIPE Hillipop+Lollipop with CLASS (all native Python)",
        "classy", like_cmb="planck_NPIPE_Hillipop"),
    "planck_2018_camb": _preset(
        "Planck 2018 with CAMB", "camb", like_cmb="planck_2018"),
    "planck_2018_classy": _preset(
        "Planck 2018 with CLASS", "classy", like_cmb="planck_2018"),
    "planck_2018_lite_camb": _preset(
        "Planck 2018 (plik-lite, native) with CAMB", "camb",
        like_cmb="planck_2018_plik_lite"),
    "planck_2018_lite_classy": _preset(
        "Planck 2018 (plik-lite, native) with CLASS", "classy",
        like_cmb="planck_2018_plik_lite"),
    "planck_2018_bicep_camb": _preset(
        "Planck 2018 + BK18 (with tensor modes) with CAMB", "camb",
        primordial="SFSR_t", like_cmb="planck_2018_bk18"),
    "planck_2018_bicep_classy": _preset(
        "Planck 2018 + BK18 (with tensor modes) with CLASS", "classy",
        primordial="SFSR_t", like_cmb="planck_2018_bk18"),
    # CMB + BAO
    "planck_2018_BAO_camb": _preset(
        "Planck 2018 + BAO with CAMB", "camb",
        like_cmb="planck_2018", like_bao="BAO_planck_2018"),
    "planck_2018_BAO_classy": _preset(
        "Planck 2018 + BAO with CLASS", "classy",
        like_cmb="planck_2018", like_bao="BAO_planck_2018"),
    "planck_BAO_latest_camb": _preset(
        "Planck 2018 + eBOSS 16 BAO with CAMB", "camb",
        like_cmb="planck_2018", like_bao="BAO_planck_latest"),
    "planck_BAO_latest_classy": _preset(
        "Planck 2018 + eBOSS 16 BAO with CLASS", "classy",
        like_cmb="planck_2018", like_bao="BAO_planck_latest"),
    "planck_desi_dr2_camb": _preset(
        "Planck 2018 + DESI DR2 BAO with CAMB", "camb",
        like_cmb="planck_2018", like_bao="BAO_desi_dr2"),
    # CMB + BAO + SN
    "planck_2018_BAO_SN_camb": _preset(
        "Planck 2018 + BAO + SN with CAMB", "camb",
        like_cmb="planck_2018", like_bao="BAO_planck_latest",
        like_sn="Pantheon"),
    "planck_2018_BAO_SN_classy": _preset(
        "Planck 2018 + BAO + SN with CLASS", "classy",
        like_cmb="planck_2018", like_bao="BAO_planck_latest",
        like_sn="Pantheon"),
    # CMB + DES + BAO + SN
    "planck_2018_DES_BAO_SN_camb": _preset(
        "Planck 2018 + DESjoint + BAO + SN with CAMB", "camb",
        like_cmb="planck_2018", like_bao="BAO_planck_latest",
        like_des="des_y1_joint", like_sn="Pantheon"),
    "planck_2018_DES_BAO_SN_classy": _preset(
        "Planck 2018 + DESjoint + BAO + SN with CLASS", "classy",
        like_cmb="planck_2018", like_bao="BAO_planck_latest",
        like_des="des_y1_joint", like_sn="Pantheon"),
}

# lensing-only presets (their own base model: DES-style priors, no reio)
lensingonly_DES_model = {
    "primordial": "SFSR_DESpriors",
    "geometry": "flat",
    "hubble": "H_DESpriors",
    "matter": "Omegab, Omegam",
    "neutrinos": "one_heavy_planck",
    "dark_energy": "lambda",
    "bbn": "YHe_des_y1",
    "reionization": "irrelevant",
}


def _lensingonly_preset(desc, theo, **fields) -> dict:
    pre = {"desc": desc, "theory": theo, **fields}
    for field, value in lensingonly_DES_model.items():
        pre.setdefault(field, value)
    pre.setdefault("sampler", "MCMC")
    return pre


preset.update({
    "planck_2018_lensonly_camb": {
        "desc": "Planck 2018 lensing only with CAMB",
        "theory": "camb",
        "like_cmb": "planck_2018_CMBmarged_lensing",
        "like_des": none,
        "primordial": "SFSR_lenspriors",
        "geometry": "flat",
        "hubble": "sound_horizon_lensonly",
        "matter": "omegab_h2_lenspriors",
        "neutrinos": "one_heavy_planck",
        "dark_energy": "lambda",
        "bbn": "consistency",
        "reionization": "irrelevant",
        "sampler": "MCMC",
    },
    "planck_2018_DES_lensingonly_camb": _lensingonly_preset(
        "Planck 2018 + DES Y1 lensing-only with CAMB", "camb",
        like_cmb="planck_2018_CMBmarged_lensing", like_des="des_y1_shear"),
    "planck_2018_DES_lensingonly_classy": _lensingonly_preset(
        "Planck 2018 + DES Y1 lensing-only with CLASS", "classy",
        like_cmb="planck_2018_CMBmarged_lensing", like_des="des_y1_shear"),
    "DES_lensingonly_camb": _lensingonly_preset(
        "DES Y1 shear-only with CAMB", "camb", like_des="des_y1_shear"),
    "DES_joint_camb": _lensingonly_preset(
        "DES Y1 joint clustering+lensing with CAMB", "camb",
        like_des="des_y1_joint"),
})

# default sampler for every preset that doesn't pin one
for _pre in preset.values():
    if "theory" in _pre:
        _pre.setdefault("sampler", default_sampler["sampler"])

# --- basic installation bundles ----------------------------------------------

install_basic: dict = {
    "theory": theory,
    "likelihood": dict(
        like_cmb["planck_NPIPE_CamSpec"]["likelihood"],
        **{
            # 2018 lensing ensures the covmat database is also installed
            "planck_2018_lensing.native": None,
            "sn.pantheon": None,
            "bao.sdss_dr12_consensus_final": None,
            "des_y1.joint": None,
        },
    ),
}

install_tests = deepcopy(install_basic)
install_tests["likelihood"].update({
    "planck_2018_highl_plik.TT": None,
    "planck_2018_highl_plik.TT_lite_native": None,
    "planck_2018_highl_CamSpec.TT": None,
    "planck_2018_highl_CamSpec2021.TT": None,
    "bicep_keck_2018": None,
})

# --- GUI combo-box layout ----------------------------------------------------

gui_groups = (
    ("Presets", (("preset", "Presets"),)),
    ("Cosmological Model", (
        ("theory", "Theory code"),
        ("primordial", "Primordial perturbations"),
        ("geometry", "Geometry"),
        ("hubble", "Hubble parameter constraint"),
        ("matter", "Matter sector"),
        ("neutrinos", "Neutrinos and other extra matter"),
        ("dark_energy", "Lambda / Dark energy"),
        ("bbn", "BBN"),
        ("reionization", "Reionization history"),
    )),
    ("Data sets", (
        ("like_cmb", "CMB experiments"),
        ("like_bao", "BAO experiments"),
        ("like_des", "DES measurements"),
        ("like_sn", "SN experiments"),
        ("like_H0", "Local H0 measurements"),
    )),
    ("Sampler", (("sampler", "Samplers"),)),
)
