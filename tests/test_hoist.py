"""Constant hoisting (ops/hoist): data tables as jit arguments, not HLO
literals — plus the compiled-program size budget for the flagship model.

Round-3 regression this guards: the flagship cosmology epoch serialized
>1 GB of likelihood tables as HLO constants and the remote-compile service
rejected it (HTTP 413).  The budget test bounds the serialized flagship
program so the class of bug is caught on CPU before a TPU ever sees it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cobaya_tpu.ops import hoist


def test_bare_mode_is_asarray():
    v = np.arange(6.0)
    out = hoist.hoisted("k", v)
    assert isinstance(out, jax.Array)
    np.testing.assert_array_equal(np.asarray(out), v)


def test_collect_and_bind_roundtrip():
    table = np.arange(12.0).reshape(3, 4)

    def fn(x):
        return hoist.hoisted("tab", table) @ x

    consts = hoist.collect(fn, np.zeros(4))
    assert set(consts) == {"tab"}
    np.testing.assert_array_equal(consts["tab"], table)

    jitted = hoist.jit_with_consts(fn, hoist.device_consts(consts))
    x = np.arange(4.0)
    np.testing.assert_allclose(np.asarray(jitted(x)), table @ x, rtol=1e-6)


def test_bound_tables_are_arguments_not_literals():
    """The compiled program must not embed the bound table's values.

    The table must not be a splat (constant-valued) array: StableHLO prints
    those compactly, hiding the baking.
    """
    table = np.random.default_rng(0).normal(size=(256, 256))

    def fn(x):
        return jnp.sum(hoist.hoisted("big", table) * x)

    consts = hoist.device_consts(hoist.collect(fn, np.zeros(256)))

    def wrapped(c, x):
        with hoist.bind(c):
            return fn(x)

    text = jax.jit(wrapped).lower(
        consts, jnp.zeros(256)).as_text()
    # a baked 256x256 constant would appear as a dense literal blob
    assert len(text) < 100_000
    # ... while the unhoisted trace embeds it
    text_baked = jax.jit(fn).lower(jnp.zeros(256)).as_text()
    assert len(text_baked) > 256 * 256


def test_bind_missing_key_falls_through():
    def fn(x):
        return hoist.hoisted("absent", np.ones(3)) @ x

    with hoist.bind({}):
        out = fn(jnp.ones(3))
    assert float(out) == 3.0


def test_gradients_flow_through_bound_constants():
    table = np.diag([1.0, 2.0, 3.0])

    def fn(x):
        return 0.5 * x @ hoist.hoisted("m", table) @ x

    consts = hoist.device_consts(hoist.collect(fn, np.zeros(3)))
    grad = hoist.jit_with_consts(jax.grad(fn), consts)(jnp.ones(3))
    np.testing.assert_allclose(np.asarray(grad), [1.0, 2.0, 3.0], rtol=1e-6)


def test_jit_with_consts_empty_is_plain_jit():
    fn = hoist.jit_with_consts(lambda x: 2 * x, {})
    assert float(fn(jnp.asarray(3.0))) == 6.0


def test_model_posterior_constants_are_collected(tmp_path):
    """A model with a matrix likelihood exposes its tables to collect()."""
    from cobaya_tpu.models.model import get_model

    d = 5
    cov = np.eye(d) * 0.5
    info = {
        "params": {f"x{i}": {"prior": {"min": -2, "max": 2}}
                   for i in range(d)},
        "likelihood": {"gaussian_mixture": {
            "means": [np.zeros(d)], "covs": [cov],
            "input_params_prefix": "x",
        }},
    }
    model = get_model(info)
    fn = model.make_logposterior_fn()
    consts = hoist.collect(fn, np.zeros(d))
    assert any(k.startswith("gaussian_mixture/") for k in consts)
    # bound evaluation == bare evaluation
    x = np.full(d, 0.3)
    bare = fn(x)
    jitted = hoist.jit_with_consts(fn, hoist.device_consts(consts))
    bound = jitted(x)
    np.testing.assert_allclose(float(bound[0]), float(bare[0]), rtol=1e-6)


# --------------------------------------------------------------------------
# flagship program-size budget
# --------------------------------------------------------------------------

#: serialized-HLO budget for the flagship epoch program.  The program
#: itself (ops, tiny scalars) is well under 4 MB; the >1 GB round-3
#: blowup came from data tables baked as literals, which hoisting and the
#: diagonal CamSpec covariance eliminate.
FLAGSHIP_PROGRAM_BUDGET_BYTES = 8 * 2 ** 20


@pytest.mark.slow
def test_flagship_epoch_program_size_budget(tmp_path):
    """The flagship cosmology sampling program must stay small when
    serialized: data tables ride as arguments, never literals."""
    from cobaya_tpu.models.model import get_model
    from cobaya_tpu.samplers.sampler import get_sampler
    from cobaya_tpu.theories.emulator import benchmodel as bm

    info = bm.flagship_info(str(tmp_path / "data"), pliklite_lmax=2508,
                            camspec_lmax=2000)
    covmat, covmat_params = bm.proposal_covmat()
    info["sampler"] = {"mcmc": {
        "seed": 1, "n_chains": 8, "covmat": covmat,
        "covmat_params": covmat_params, "learn_every": 4,
        "records_per_epoch": 2, "max_samples": 8,
    }}
    model = get_model({k: v for k, v in info.items() if k != "sampler"})
    sampler = get_sampler(info["sampler"], model)
    # consts were hoisted at init: significant tables, none in the program
    assert hoist.consts_bytes(sampler._consts) > 1_000_000
    epoch = sampler._epoch_fn
    # reconstruct the exact epoch invocation abstractly and lower it
    n_rec, thin = sampler._epoch_shape(sampler._learn_every)
    from cobaya_tpu.ops.proposal import make_block_schedule

    schedule = make_block_schedule(
        sampler._proposal, n_rec * thin, np.random.default_rng(0)
    ).reshape(n_rec, thin)
    lowered = epoch.lower(
        sampler._carry, jnp.asarray(schedule), *sampler._prop_dev)
    nbytes = len(lowered.as_text().encode())
    assert nbytes < FLAGSHIP_PROGRAM_BUDGET_BYTES, (
        f"flagship epoch program serialized to {nbytes} bytes "
        f"(budget {FLAGSHIP_PROGRAM_BUDGET_BYTES}): a data table is being "
        "baked into the HLO — hoist it (ops/hoist)."
    )
