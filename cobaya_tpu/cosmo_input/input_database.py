"""Declarative database of cosmological model/dataset building blocks.

Capability parity (compact) with
/root/reference/cobaya/cosmo_input/input_database.py: per-field dictionaries
(primordial, geometry, hubble, matter, neutrinos, dark_energy, bbn,
reionization) with per-theory parameter blocks, likelihood combos, and named
presets consumed by :func:`cosmo_input.create_input.create_input`.
"""

from __future__ import annotations

none = "none"
error_msg = "error_msg"

theory: dict = {"camb": None, "classy": None}

# --- model building blocks ---------------------------------------------------
primordial: dict = {
    none: {},
    "SFSR": {
        "desc": "Adiabatic scalar perturbations, power-law spectrum",
        "theory": {"camb": None, "classy": None},
        "params": {
            "logA": {
                "prior": {"min": 1.61, "max": 3.91},
                "ref": {"dist": "norm", "loc": 3.05, "scale": 0.001},
                "proposal": 0.001, "latex": r"\log(10^{10} A_\mathrm{s})",
                "drop": True,
            },
            "As": {
                "value": "lambda logA: 1e-10*np.exp(logA)",
                "latex": r"A_\mathrm{s}",
            },
            "ns": {
                "prior": {"min": 0.8, "max": 1.2},
                "ref": {"dist": "norm", "loc": 0.965, "scale": 0.004},
                "proposal": 0.002, "latex": r"n_\mathrm{s}",
            },
        },
    },
    "SFSR_run": {
        "desc": "Power-law spectrum with running",
        "theory": {"camb": None, "classy": None},
        "params": {},  # filled below: SFSR + nrun
    },
}
primordial["SFSR_run"]["params"] = dict(primordial["SFSR"]["params"])
primordial["SFSR_run"]["params"]["nrun"] = {
    "prior": {"min": -1, "max": 1},
    "ref": {"dist": "norm", "loc": 0, "scale": 0.005},
    "proposal": 0.001, "latex": r"n_\mathrm{run}",
}

geometry: dict = {
    none: {},
    "flat": {"desc": "Flat FLRW universe",
             "theory": {"camb": None, "classy": None}},
    "omegak": {
        "desc": "FLRW model with varying curvature",
        "theory": {"camb": None, "classy": None},
        "params": {
            "omegak": {
                "prior": {"min": -0.3, "max": 0.3},
                "ref": {"dist": "norm", "loc": 0, "scale": 0.001},
                "proposal": 0.001, "latex": r"\Omega_k",
            },
        },
    },
}

hubble: dict = {
    none: {},
    "H": {
        "desc": "Hubble parameter",
        "theory": {"camb": None, "classy": None},
        "params": {
            "H0": {
                "prior": {"min": 40, "max": 100},
                "ref": {"dist": "norm", "loc": 67.5, "scale": 2},
                "proposal": 2, "latex": r"H_0",
            },
        },
    },
    "sound_horizon_last_scattering": {
        "desc": "Angular size of the sound horizon (CosmoMC's theta_MC)",
        "theory": {"camb": None},
        "params": {
            "theta_MC_100": {
                "prior": {"min": 0.5, "max": 10},
                "ref": {"dist": "norm", "loc": 1.04109, "scale": 0.0004},
                "proposal": 0.0002, "latex": r"100\theta_\mathrm{MC}",
                "drop": True, "renames": ["theta"],
            },
            "cosmomc_theta": {
                "value": "lambda theta_MC_100: 1.e-2*theta_MC_100",
                "derived": False,
            },
            "H0": {"latex": r"H_0", "min": 20, "max": 100},
        },
    },
}

matter: dict = {
    none: {},
    "omegab_h2, omegac_h2": {
        "desc": "Baryon and CDM densities",
        "theory": {"camb": None, "classy": None},
        "params": {
            "ombh2": {
                "prior": {"min": 0.005, "max": 0.1},
                "ref": {"dist": "norm", "loc": 0.0224, "scale": 0.0001},
                "proposal": 0.0001, "latex": r"\Omega_\mathrm{b} h^2",
            },
            "omch2": {
                "prior": {"min": 0.001, "max": 0.99},
                "ref": {"dist": "norm", "loc": 0.120, "scale": 0.001},
                "proposal": 0.0005, "latex": r"\Omega_\mathrm{c} h^2",
            },
            "omegam": {"latex": r"\Omega_\mathrm{m}"},
        },
    },
}

neutrinos: dict = {
    none: {},
    "one_heavy_planck": {
        "desc": "Two massless + one 0.06 eV neutrino",
        "theory": {
            "camb": {"extra_args": {"num_massive_neutrinos": 1,
                                    "nnu": 3.044}},
            "classy": {"extra_args": {"N_ncdm": 1, "m_ncdm": 0.06,
                                      "N_ur": 2.0328}},
        },
        "params": {"mnu": 0.06},
    },
    "varying_mnu": {
        "desc": "Varying total neutrino mass",
        "theory": {"camb": {"extra_args": {"num_massive_neutrinos": 3,
                                           "nnu": 3.044}}},
        "params": {
            "mnu": {
                "prior": {"min": 0, "max": 5},
                "ref": {"dist": "norm", "loc": 0.02, "scale": 0.1},
                "proposal": 0.03, "latex": r"\sum m_\nu",
            },
        },
    },
}

dark_energy: dict = {
    none: {},
    "lambda": {"desc": "Cosmological constant",
               "theory": {"camb": None, "classy": None}},
    "de_w": {
        "desc": "Constant equation of state",
        "theory": {"camb": {"extra_args": {"dark_energy_model": "ppf"}},
                   "classy": None},
        "params": {
            "w": {
                "prior": {"min": -3, "max": -0.333},
                "ref": {"dist": "norm", "loc": -0.99, "scale": 0.02},
                "proposal": 0.02, "latex": r"w_\mathrm{DE}",
            },
        },
    },
}

bbn: dict = {
    none: {},
    "consistency": {"desc": "BBN-consistent helium fraction",
                    "theory": {"camb": None, "classy": None}},
    "YHe": {
        "desc": "Varying helium fraction",
        "theory": {"camb": None, "classy": None},
        "params": {
            "yhe": {
                "prior": {"min": 0.1, "max": 0.5},
                "ref": {"dist": "norm", "loc": 0.245, "scale": 0.006},
                "proposal": 0.003, "latex": r"Y_\mathrm{He}",
            },
        },
    },
}

reionization: dict = {
    none: {},
    "std": {
        "desc": "Optical depth to reionization",
        "theory": {"camb": None, "classy": None},
        "params": {
            "tau": {
                "prior": {"min": 0.01, "max": 0.8},
                "ref": {"dist": "norm", "loc": 0.055, "scale": 0.006},
                "proposal": 0.003, "latex": r"\tau_\mathrm{reio}",
            },
        },
    },
    "gauss_prior": {
        "desc": "Gaussian prior on tau",
        "theory": {"camb": None, "classy": None},
        "params": {
            "tau": {
                "prior": {"dist": "norm", "loc": 0.055, "scale": 0.009},
                "ref": {"dist": "norm", "loc": 0.055, "scale": 0.006},
                "proposal": 0.003, "latex": r"\tau_\mathrm{reio}",
            },
        },
    },
}

# --- likelihood combos ---------------------------------------------------------
like_cmb: dict = {
    none: {},
    "planck_2018_plik_lite": {
        "desc": "Planck 2018 TT,TE,EE (plik-lite) + lowl + lensing",
        "likelihood": {
            "planck_2018_lowl.TT": None,
            "planck_2018_lowl.EE": None,
            "planck_2018_highl_plik.TTTEEE_lite": None,
            "planck_2018_lensing.clik": None,
        },
    },
}

like_bao: dict = {
    none: {},
    "BAO_planck_2018": {
        "desc": "Planck-2018-era BAO compilation",
        "likelihood": {
            "bao.sixdf_2011_bao": None,
            "bao.sdss_dr7_mgs": None,
            "bao.sdss_dr12_consensus_bao": None,
        },
    },
}

like_sn: dict = {
    none: {},
    "Pantheon": {"desc": "Pantheon SNIa",
                 "likelihood": {"sn.pantheon": None}},
}

like_H0: dict = {
    none: {},
    "Riess2020": {"desc": "Riess 2020 H0",
                  "likelihood": {"H0.riess2020": None}},
}

like_des: dict = {none: {}}

sampler: dict = {
    "MCMC": {"desc": "Adaptive MCMC", "sampler": {"mcmc": {"drag": False}}},
    "MCMC dragging": {"desc": "MCMC with fast-dragging",
                      "sampler": {"mcmc": {"drag": True}}},
    "PolyChord": {"desc": "Nested sampling", "sampler": {"polychord": None}},
}

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

preset: dict = {
    none: {"desc": "(No preset chosen)"},
    "planck_2018_camb": {
        "desc": "Planck 2018 LCDM with CAMB",
        "theory": "camb",
        "like_cmb": "planck_2018_plik_lite",
        **planck_base_model,
    },
    "planck_2018_classy": {
        "desc": "Planck 2018 LCDM with CLASS",
        "theory": "classy",
        "like_cmb": "planck_2018_plik_lite",
        **{**planck_base_model, "hubble": "H"},
    },
    "planck_2018_bao_camb": {
        "desc": "Planck 2018 + BAO LCDM with CAMB",
        "theory": "camb",
        "like_cmb": "planck_2018_plik_lite",
        "like_bao": "BAO_planck_2018",
        **planck_base_model,
    },
}
