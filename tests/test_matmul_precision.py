"""Posterior programs must run the MXU in full-f32 precision.

On TPU, float32 matmuls default to fast bfloat16 passes; a batched (vmapped)
likelihood then loses ~3 decimal digits per contraction.  For chi^2 magnitudes
of O(10^4) this corrupts logp by O(10^2): observed on hardware as the flagship
cosmology posterior evaluating 253 log-units wrong at the truth point, with
the sampler exploring numerical-error terrain (R-1 stuck at ~10^4).  The
reference never faces this (CPU BLAS is full f32/f64 — cobaya functions.py:64),
so this is a TPU-specific correctness contract: every traced posterior
program carries Precision.HIGHEST on its contractions unless the user opts
out with ``matmul_precision: null``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cobaya_tpu.models.model import get_model


def _info(dim=8):
    rng = np.random.default_rng(0)
    q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
    cov = (q * np.geomspace(0.1, 1.0, dim)) @ q.T
    return {
        "params": {
            f"x{i}": {"prior": {"dist": "norm", "loc": 0, "scale": 2}}
            for i in range(dim)
        },
        "likelihood": {
            "gaussian_mixture": {
                "means": [np.zeros(dim).tolist()],
                "covs": [((cov + cov.T) / 2).tolist()],
                "input_params_prefix": "x",
            }
        },
    }


def _lowered_text(model, batch=4, dim=8):
    fn = model.make_logposterior_fn()
    batched = jax.vmap(lambda x: fn(x)[0])
    x = jnp.zeros((batch, dim), jnp.float32)
    return jax.jit(batched).lower(x).as_text()


def test_posterior_program_contracts_at_highest_precision():
    model = get_model(_info())
    assert model.matmul_precision == "highest"
    text = _lowered_text(model)
    assert "HIGHEST" in text, (
        "vmapped posterior program lowered without Precision.HIGHEST "
        "contractions — bf16 MXU passes would corrupt logp on TPU"
    )
    # and no contraction was left at DEFAULT precision
    assert "precision = [DEFAULT" not in text


def test_matmul_precision_opt_out():
    info = _info()
    info["matmul_precision"] = None
    model = get_model(info)
    assert model.matmul_precision is None
    text = _lowered_text(model)
    assert "HIGHEST" not in text


def test_blocked_evaluator_contracts_at_highest_precision():
    model = get_model(_info())
    full_eval, block_eval = model.make_blocked_logposterior_fn(
        [[0, 1, 2, 3], [4, 5, 6, 7]]
    )
    x = jnp.zeros((8,), jnp.float32)
    text = jax.jit(lambda x: full_eval(x)[0]).lower(x).as_text()
    assert "HIGHEST" in text


def test_vmapped_matches_single_point():
    model = get_model(_info())
    fn = model.make_logposterior_fn()
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    single = np.array([float(fn(x)[0]) for x in xs])
    batched = np.asarray(jax.jit(jax.vmap(lambda x: fn(x)[0]))(xs))
    np.testing.assert_allclose(batched, single, rtol=0, atol=5e-4)
