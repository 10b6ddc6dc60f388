"""Naming conventions, file extensions, and physical constants.

Output-format compatibility with the reference (cobaya) chain files requires
the same column names and derived-parameter name builders
(cf. /root/reference/cobaya/conventions.py:48-129).
"""

from __future__ import annotations

# --- input dict block names -------------------------------------------------
kinds = ("theory", "likelihood", "sampler")

# --- output column names (chain txt schema) ---------------------------------
OUT_WEIGHT = "weight"
OUT_MINUSLOGPOST = "minuslogpost"
OUT_MINUSLOGPRIOR = "minuslogprior"
OUT_CHI2 = "chi2"

# separator between aggregated-quantity name and component name
SEPARATOR = "__"

# name of the uniform-prior aggregate (always present)
PRIOR_0 = "0"


def minuslogprior_name(prior_name: str) -> str:
    return OUT_MINUSLOGPRIOR + SEPARATOR + prior_name


def chi2_name(like_name: str) -> str:
    return OUT_CHI2 + SEPARATOR + like_name


def undo_chi2_name(name: str) -> str:
    return name[len(OUT_CHI2 + SEPARATOR):]


def is_derived_aggregate(name: str) -> bool:
    return name.startswith(OUT_CHI2 + SEPARATOR) or name.startswith(
        OUT_MINUSLOGPRIOR + SEPARATOR
    )


# --- file extensions ---------------------------------------------------------
class Extension:
    checkpoint = ".checkpoint"
    progress = ".progress"
    covmat = ".covmat"
    evidence = ".logZ"
    input_suffix = ".input.yaml"
    updated_suffix = ".updated.yaml"
    locked = ".locked"
    dill = ".dill_pickle"


# per-run reserved option keys at the top level of the input dict
reserved_attributes = {
    "params", "likelihood", "theory", "prior", "sampler", "output",
    "packages_path", "debug", "resume", "force", "test", "timing",
    "stop_at_error", "version", "post", "matmul_precision",
}

# packages-path subfolders
subfolders = {"theory": "code", "likelihood": "data", "sampler": "code"}

# modeled constant framework overhead per posterior evaluation (seconds);
# used by the speed-blocking cost model.  On-device the true overhead is far
# smaller (the whole step is fused), but the constant is kept for parity with
# the reference cost model when blocking decisions are made for host-callback
# components.
overhead_time = 3e-4

# default number of parallel walkers per chip for the vmapped samplers
default_n_chains = 1024

# --- physical constants (SI unless noted) ------------------------------------
class Const:
    c_km_s = 299792.458  # speed of light, km/s
    G = 6.67430e-11  # gravitational constant
    h_J_s = 6.62607015e-34  # Planck constant
    kB_J_K = 1.380649e-23  # Boltzmann constant
    T_CMB = 2.7255  # CMB temperature, K


# debug/test env vars
packages_path_env = "COBAYA_TPU_PACKAGES_PATH"
packages_path_arg = "packages_path"
test_skip_env = "COBAYA_TPU_TEST_SKIP"
install_skip_env = "COBAYA_TPU_INSTALL_SKIP"
