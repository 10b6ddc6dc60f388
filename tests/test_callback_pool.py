"""Pooled host-callback bridge: wall-clock gain and thread-safety.

The reference amortizes slow theory codes by giving each MPI rank its own
instance (/root/reference/cobaya/theories/camb/camb.py:675-774).  Here the
batched ``pure_callback`` delivers the whole walker batch in one host call,
which the Model fans out over a thread pool (``callback_pool``): provider
views are thread-local, the token store is lock-protected, result rows are
disjoint.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cobaya_tpu.models.model import get_model
from cobaya_tpu.models.theory import Theory


def _sleepy_info(pool, dt):
    def sleepy(x0, x1):
        time.sleep(dt)
        return float(-0.5 * (x0 ** 2 + x1 ** 2))

    return {
        "params": {
            "x0": {"prior": [-1, 1]},
            "x1": {"prior": [-1, 1]},
        },
        "likelihood": {
            "sleepy": {
                "external": sleepy, "speed": 1, "jittable": False,
                "callback_pool": pool, "input_params": ["x0", "x1"],
            }
        },
    }


def _timed_batch_eval(info, pts):
    model = get_model(info)
    fn = jax.jit(jax.vmap(model.make_logposterior_fn()))
    out = fn(pts)  # compile + first run
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    out = fn(pts)
    jax.block_until_ready(out[0])
    return time.perf_counter() - t0, np.asarray(out[0])


def test_pool_speedup_sleeping_theory():
    """256 walkers x 8 ms host likelihood: pool=8 ~8x, pool=16 >8x."""
    n, dt = 256, 0.008
    pts = jnp.asarray(
        np.random.default_rng(0).uniform(-0.5, 0.5, (n, 2)), jnp.float32
    )
    t_serial, v_serial = _timed_batch_eval(_sleepy_info(0, dt), pts)
    t_pool8, v_pool8 = _timed_batch_eval(_sleepy_info(8, dt), pts)
    t_pool16, v_pool16 = _timed_batch_eval(_sleepy_info(16, dt), pts)
    np.testing.assert_allclose(v_pool8, v_serial, rtol=1e-6)
    np.testing.assert_allclose(v_pool16, v_serial, rtol=1e-6)
    assert t_serial / t_pool8 > 6.0, (t_serial, t_pool8)
    assert t_serial / t_pool16 > 8.0, (t_serial, t_pool16)


class HostDoubler(Theory):
    """Non-jittable token-producing theory (object-store bridge)."""

    jittable = False

    def get_requirements(self):
        return {"x0": None}

    def get_can_provide(self):
        return ["two_x"]

    def callback_output_spec(self):
        return {"two_x": jax.ShapeDtypeStruct((), jnp.float32)}

    def calculate(self, state, want_derived=True, **params):
        state["two_x"] = 2.0 * params["x0"]


def _host_like(x1, _self=None):
    two_x = _self.provider.get_result("two_x")
    return float(-0.5 * ((two_x - x1) ** 2))


def _token_chain_info(pool):
    return {
        "theory": {"HostDoubler": {"external": HostDoubler,
                                   "callback_pool": pool}},
        "likelihood": {
            "uses_host": {
                "external": _host_like, "jittable": False,
                "callback_pool": pool,
                "requires": {"two_x": None}, "input_params": ["x1"],
            }
        },
        "params": {
            "x0": {"prior": [-1, 1]},
            "x1": {"prior": [-1, 1]},
        },
    }


@pytest.mark.parametrize("pool", [4])
def test_pooled_token_bridge_matches_serial(pool):
    """Host theory -> token -> host likelihood, pooled vs serial: identical,
    and each walker resolves *its own* provider state."""
    n = 64
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (n, 2)), jnp.float32)

    def batch_logpost(info):
        model = get_model(info)
        fn = jax.jit(jax.vmap(model.make_logposterior_fn()))
        return np.asarray(fn(pts)[0])

    serial = batch_logpost(_token_chain_info(0))
    pooled = batch_logpost(_token_chain_info(pool))
    # analytic per-walker expectation (uniform priors contribute a constant)
    x = np.asarray(pts)
    expect_like = -0.5 * (2.0 * x[:, 0] - x[:, 1]) ** 2
    np.testing.assert_allclose(pooled, serial, rtol=1e-5)
    np.testing.assert_allclose(
        pooled - serial[0] + expect_like[0], expect_like, atol=1e-4
    )


def test_pool_env_var(monkeypatch):
    """COBAYA_TPU_CALLBACK_POOL applies when the component doesn't set one."""
    monkeypatch.setenv("COBAYA_TPU_CALLBACK_POOL", "4")
    info = _sleepy_info(None, 0.0)
    del info["likelihood"]["sleepy"]["callback_pool"]
    n = 32
    pts = jnp.asarray(
        np.random.default_rng(2).uniform(-0.5, 0.5, (n, 2)), jnp.float32
    )
    model = get_model(info)
    assert model._callback_pool_size(model.components[0]) == 4
    fn = jax.jit(jax.vmap(model.make_logposterior_fn()))
    out = np.asarray(fn(pts)[0])
    x = np.asarray(pts)
    like = -0.5 * (x[:, 0] ** 2 + x[:, 1] ** 2)
    np.testing.assert_allclose(out - out[0] + like[0], like, atol=1e-4)


def test_measured_speed_includes_pool_amortization():
    """measure_and_set_speeds divides a host component's per-eval time by
    its callback pool: that is the per-walker cost the blocking math sees
    when the bridge fans the batch out."""
    dt = 0.05
    info_pooled = _sleepy_info(8, dt)
    model = get_model(info_pooled)
    model.measure_and_set_speeds(n=3, random_state=0)
    pooled_speed = model.components[0].get_speed()
    info_serial = _sleepy_info(0, dt)
    model2 = get_model(info_serial)
    model2.measure_and_set_speeds(n=3, random_state=0)
    serial_speed = model2.components[0].get_speed()
    # ~8x per-walker speed with pool=8: measure_and_set_speeds times
    # single-point evals and divides the average by the pool size
    # analytically (model.py), so the ratio is arithmetic — the margin
    # below the ideal 8x only absorbs timing-overhead noise around the
    # dominant sleep, not concurrency effects.
    assert pooled_speed / serial_speed > 2
