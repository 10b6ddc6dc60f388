"""Published-best-fit chi-squared regression harness.

Port of the reference's stored-value cosmology testing strategy
(/root/reference/tests/common_cosmo.py:22-70): every experiment likelihood
is evaluated at a published best-fit point and its chi^2 compared against
the stored reference value, with derived parameters checked in units of the
Planck-2015 sigmas.  Tests that need external code (CAMB) or downloaded
data releases are skip-gated exactly like the reference's
``--skip-not-installed`` / ``COBAYA_TEST_SKIP`` mechanism
(/root/reference/tests/conftest.py:54-81): set ``COBAYA_TPU_PACKAGES_PATH``
to an installed packages directory to activate them.  The data-light
families (H0/Mb point likelihoods) always run.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

# reference common_cosmo.py:19 — derived-param tolerance in Planck-2015 sigma
TOLERANCE_DERIVED = 0.055

PACKAGES_ENV = "COBAYA_TPU_PACKAGES_PATH"


def packages_path_or_skip() -> str:
    path = os.environ.get(PACKAGES_ENV)
    if not path or not os.path.isdir(path):
        pytest.skip(
            f"needs installed cosmology packages: set {PACKAGES_ENV} "
            "(cobaya-tpu-install <input.yaml> downloads the data releases)"
        )
    return path


def require_camb():
    try:
        import camb  # noqa: F401
    except ImportError:
        pytest.skip("needs external CAMB (pip install camb)")


def body_of_test(best_fit, info_likelihood, info_theory, ref_chi2,
                 best_fit_derived=None, packages_path=None):
    """Evaluate likelihoods at ``best_fit`` and assert stored chi^2 values.

    Mirrors /root/reference/tests/common_cosmo.py:22-70: builds the model
    from explicit likelihood/theory blocks, evaluates once, and compares
    each likelihood's chi^2 to ``ref_chi2[like]`` within
    ``ref_chi2['tolerance']``; derived parameters (``{name: [value,
    sigma]}``) must match within TOLERANCE_DERIVED of their sigma.
    """
    from cobaya_tpu.models.model import get_model

    info = {
        "params": dict(best_fit),
        "likelihood": dict(info_likelihood),
        "stop_at_error": True,
    }
    if info_theory:
        info["theory"] = dict(info_theory)
    if packages_path:
        info["packages_path"] = packages_path
    if best_fit_derived:
        for p in best_fit_derived:
            info["params"].setdefault(p, {"derived": True})
    model = get_model(info)
    point = {p: best_fit[p]
             for p in model.parameterization.sampled_params()}
    loglikes, derived = model.loglikes(point)
    likes = dict(zip(list(model.likelihood), np.atleast_1d(loglikes)))
    derived = dict(zip(list(model.parameterization.derived_params()),
                       np.atleast_1d(derived)))
    for like, ref in ref_chi2.items():
        if like in ("tolerance", "classy_extra_tolerance"):
            continue
        chi2 = -2 * likes[like]
        assert np.isfinite(chi2), f"chi2 of '{like}' is not finite"
        assert abs(chi2 - ref) < ref_chi2["tolerance"], (
            f"chi2 of '{like}': {chi2:.3f} (now) vs {ref:.3f} (stored), "
            f"|diff| >= {ref_chi2['tolerance']}"
        )
    for p, (val, sig) in (best_fit_derived or {}).items():
        if val is None:
            continue
        rel = abs(derived[p] - val) / sig
        assert rel < TOLERANCE_DERIVED, (
            f"derived '{p}': {derived[p]:.6g} vs {val:.6g} "
            f"({rel:.3f} sigma >= {TOLERANCE_DERIVED})"
        )
    return model, likes, derived
