"""Public-API parity with the reference's core classes.

A user migrating from cobaya should find the reference's public methods and
properties on the equivalent classes here (reference: model.py, theory.py,
likelihood.py, prior.py, collection.py, sampler.py).  This test pins the
surface; behavior is covered by the per-feature tests.
"""

import numpy as np
import pytest

from cobaya_tpu.io.collection import SampleCollection
from cobaya_tpu.models.likelihood import Likelihood
from cobaya_tpu.models.model import Model, get_model
from cobaya_tpu.models.prior import Prior
from cobaya_tpu.models.theory import Theory
from cobaya_tpu.samplers.sampler import Sampler

SURFACES = {
    Model: [
        "info", "logposterior", "logprior", "loglike", "loglikes",
        "get_valid_point", "get_versions", "get_speeds", "requested",
        "set_cache_size", "get_auto_covmat", "add_requirements",
        "measure_and_set_speeds", "dump_timing",
        "get_param_blocking_for_sampler",
    ],
    Theory: [
        "get_requirements", "must_provide", "get_can_provide",
        "get_can_provide_methods", "get_can_provide_params",
        "get_can_support_params", "get_allow_agnostic",
        "initialize_with_params", "initialize_with_provider",
        "get_helper_theories", "check_cache_and_compute",
        "get_current_derived", "current_derived", "type_list",
        "input_params_extra", "set_cache_size", "get_provider",
        "get_param", "get_result", "get_speed", "set_measured_speed",
    ],
    Likelihood: [
        "logp", "marginal", "wait", "calculate", "get_requirements",
        "current_logp",
    ],
    Prior: [
        "d", "bounds", "sample", "logp", "logps_internal",
        "logps_external", "covmat", "set_reference", "reference",
        "reference_is_pointlike", "reference_variances",
    ],
    SampleCollection: [
        "add", "append_rows", "mean", "cov", "bestfit", "MAP",
        "sampled_values", "detempered_copy", "reset_temperature",
        "reweight", "skip_samples", "thin_samples", "filtered_copy",
        "copy", "out_update", "is_tempered", "has_int_weights",
        "n_last_out", "reset", "to_numpy", "to_getdist", "get_stats",
    ],
    Sampler: [
        "initialize", "run", "products", "samples", "info",
        "random_state", "converge_info_changed", "set_checkpoint_info",
        "delete_output_files", "checkpoint_filename",
        "output_files_regexps", "check_force_resume",
    ],
}


@pytest.mark.parametrize("cls", list(SURFACES), ids=lambda c: c.__name__)
def test_public_surface(cls):
    missing = [name for name in SURFACES[cls] if not hasattr(cls, name)]
    assert not missing, f"{cls.__name__} lacks {missing}"


def _tiny_model():
    return get_model({
        "params": {
            "x0": {"prior": [-1, 1], "ref": [0.0, 0.1]},
            "x1": {"prior": {"dist": "norm", "loc": 0, "scale": 2}},
        },
        "likelihood": {"gaussian_mixture": {
            "means": [[0.1, -0.2]], "covs": [[[0.01, 0.0], [0.0, 0.02]]],
            "input_params_prefix": "x",
        }},
    })


def test_model_introspection_behaves():
    m = _tiny_model()
    assert m.get_speeds()["likelihood"]["gaussian_mixture"] > 0
    assert m.requested() == {}  # nothing requires theory products here
    m.set_cache_size(5)
    assert m.get_auto_covmat() is None  # no covmat-database theory loaded
    # separable prior covariance: U(-1,1) var = 1/3; N(0,2) var = 4
    np.testing.assert_allclose(np.diag(m.prior.covmat()), [1 / 3, 4.0])


def test_set_cache_size_keeps_newest_state():
    m = _tiny_model()
    like = list(m.likelihood.values())[0]
    m.logposterior(np.array([0.3, 0.1]))
    m.logposterior(np.array([0.7, -0.2]))
    newest = like.current_state.get("_key")
    m.set_cache_size(1)
    assert like.current_state.get("_key") == newest
    assert like._states.maxlen == 1


def test_prior_set_reference():
    m = _tiny_model()
    m.prior.set_reference({"x1": 0.7})
    pt = m.prior.reference(random_state=3)
    assert pt[1] == 0.7  # fixed ref honored
    m.prior.set_reference({"x1": None})
    with pytest.raises(Exception):
        m.prior.set_reference({"nope": 1.0})


def test_collection_flags_and_reset(tmp_path):
    m = _tiny_model()
    c = SampleCollection(m, None, name="1")
    x = np.array([[0.1, -0.2], [0.2, 0.1]])
    c.append_batch(x, np.zeros(2), np.zeros((2, 1)), np.zeros((2, 1)),
                   np.zeros((2, 0)), weights=np.array([1.0, 2.0]), rle=False)
    assert not c.is_tempered
    assert c.has_int_weights
    assert c.to_numpy(copy=True).shape == (2, len(c.columns))
    assert c.n_last_out == 0  # in-memory: never flushed
    c.reset()
    assert len(c) == 0
