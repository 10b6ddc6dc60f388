"""Ensemble independence-remix move (ops/remix.py).

The move must (a) be an exact MH kernel — posteriors sampled with it stay
correct to the usual KL budget (reference tests/common_sampler.py:18), and
(b) do its job: teleport straggler walkers into the bulk in O(1)
applications, where plain Metropolis needs O((distance/step)^2) steps.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cobaya_tpu.models.model import get_model
from cobaya_tpu.ops.metropolis import init_carry
from cobaya_tpu.ops.remix import make_remix_fn
from cobaya_tpu.run import run
from cobaya_tpu.utils.tools import KL_norm


def _gauss_info(dim=4, n_chains=64, **mcmc):
    rng = np.random.default_rng(3)
    q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
    cov = (q * np.geomspace(0.1, 1.0, dim)) @ q.T
    cov = (cov + cov.T) / 2
    info = {
        "params": {
            f"x{i}": {"prior": {"dist": "norm", "loc": 0, "scale": 3},
                      "ref": {"dist": "norm", "loc": 0, "scale": 1.0}}
            for i in range(dim)
        },
        "likelihood": {
            "gaussian_mixture": {
                "means": [np.zeros(dim).tolist()],
                "covs": [cov.tolist()],
                "input_params_prefix": "x",
            }
        },
        "sampler": {"mcmc": {
            "seed": 7, "n_chains": n_chains, "covmat": cov,
            "covmat_params": [f"x{i}" for i in range(dim)],
            "Rminus1_stop": 0.03, "Rminus1_cl_stop": 1e6,
            "learn_every": "20d", "max_samples": 30000, **mcmc,
        }},
    }
    return info, cov


def test_straggler_teleports_home():
    dim, C = 4, 64
    info, cov = _gauss_info(dim, C)
    model = get_model({k: v for k, v in info.items() if k != "sampler"})
    fn = model.make_logposterior_fn()
    rng = np.random.default_rng(0)
    x0 = rng.multivariate_normal(np.zeros(dim), cov, size=C)
    x0[0] = 12.0  # ~40 sigma out along every axis: a hopeless straggler
    carry = init_carry(jax.random.key(0), jnp.asarray(x0, jnp.float32), fn)
    lp_before = float(carry.logpost[0])
    remix = jax.jit(make_remix_fn(fn))
    carry2, acc = remix(carry)
    lp_after = float(carry2.logpost[0])
    # the straggler's importance ratio pi/q is ~0, so any bulk proposal is
    # accepted: one application must move it to typical logp
    assert lp_after > lp_before + 100
    assert float(jnp.median(carry2.logpost)) > -30
    # bulk walkers were not broken
    assert np.isfinite(np.asarray(carry2.logpost)).all()
    assert 0.0 < float(acc) <= 1.0


def test_remix_preserves_posterior():
    dim = 4
    info, cov = _gauss_info(dim, 256, ensemble_remix=True, remix_every=1)
    upd, sampler = run(info)
    products = sampler.products()["sample"]
    mean = products.mean(first=int(0.3 * len(products)))
    smp_cov = products.cov(first=int(0.3 * len(products)))
    kl = KL_norm(np.zeros(dim), cov, mean, smp_cov)
    assert kl < 0.07, f"KL {kl} too large with remix enabled"


def test_remix_keeps_blocked_cache_consistent():
    """After a remix teleport the per-walker component cache must describe
    the NEW point (full_eval path), or fast-block steps would reuse stale
    slow-block products."""
    dim, C = 4, 32
    info, cov = _gauss_info(dim, C)
    model = get_model({k: v for k, v in info.items() if k != "sampler"})
    full_eval, block_eval = model.make_blocked_logposterior_fn(
        [[0, 1], [2, 3]]
    )
    fn = model.make_logposterior_fn()
    rng = np.random.default_rng(1)
    x0 = rng.multivariate_normal(np.zeros(dim), cov, size=C)
    x0[:4] = 9.0
    carry = init_carry(jax.random.key(1), jnp.asarray(x0, jnp.float32), fn,
                       full_eval=full_eval)
    remix = jax.jit(make_remix_fn(fn, full_eval=full_eval))
    carry2, _ = remix(carry)
    # recompute each walker's posterior from scratch: must equal both the
    # carried logpost and a blocked evaluation through the carried cache
    lp_scratch = jax.vmap(lambda x: fn(x)[0])(carry2.x)
    np.testing.assert_allclose(np.asarray(lp_scratch),
                               np.asarray(carry2.logpost),
                               rtol=0, atol=1e-3)
    lp_blocked = jax.vmap(
        lambda x, c: block_eval(jnp.int32(1), x, c)[0]
    )(carry2.x, carry2.cache)
    np.testing.assert_allclose(np.asarray(lp_blocked),
                               np.asarray(carry2.logpost),
                               rtol=0, atol=1e-3)
