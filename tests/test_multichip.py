"""Multi-device: sharded walker state, mesh collectives, dryrun entry."""

import numpy as np
import pytest


def test_mcmc_state_is_sharded_across_devices():
    import jax

    from cobaya_tpu.run import run

    assert len(jax.devices()) == 8  # conftest forces 8 virtual CPU devices
    from common import random_gaussian_info

    info = random_gaussian_info(dim=2, random_state=3)
    info["sampler"] = {"mcmc": {"seed": 4, "n_chains": 16,
                                "max_samples": 120}}
    _, sampler = run(info)
    assert sampler._mesh is not None
    sh = sampler._carry.x.sharding
    # walker axis split over all 8 devices
    assert len(sh.device_set) == 8
    shard_shape = sh.shard_shape(sampler._carry.x.shape)
    assert shard_shape[0] == sampler.n_chains // 8


def test_n_chains_rounded_to_devices():
    from cobaya_tpu.run import run
    from common import random_gaussian_info

    info = random_gaussian_info(dim=2, random_state=5)
    info["sampler"] = {"mcmc": {"seed": 4, "n_chains": 13,
                                "max_samples": 60}}
    _, sampler = run(info)
    assert sampler.n_chains == 16  # rounded up to a multiple of 8


def test_nested_live_points_sharded():
    import jax

    from cobaya_tpu.run import run
    from common import random_gaussian_info

    info = random_gaussian_info(dim=2, random_state=7)
    info["sampler"] = {"nested": {
        "seed": 2, "nlive": 64, "max_ndead": 400, "batch_size": 8,
    }}
    _, sampler = run(info)
    assert sampler._mesh is not None
    sh = sampler._final_live_sharding
    assert sh is not None and len(sh.device_set) == 8
    assert sh.shard_shape((sampler._nlive, sampler.d))[0] == \
        sampler._nlive // 8


def test_minimize_starts_sharded():
    from cobaya_tpu.run import run
    from common import random_gaussian_info

    info = random_gaussian_info(dim=2, random_state=9)
    info["sampler"] = {"minimize": {"seed": 3, "best_of": 4}}
    _, sampler = run(info)
    assert sampler._mesh is not None
    sh = sampler._starts_sharding
    # 4 starts padded to 8 and split one per device
    assert sh is not None and len(sh.device_set) == 8
    assert np.isfinite(sampler.result["fun"])


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_moments_psum_reduction_matches_host():
    """Cross-device reduction of sharded moments == host-side reduction.

    The per-walker sums (count/anchor/s1) shard over the mesh; the pooled
    (d, d) second moment is replicated (XLA keeps it globally consistent
    through the sharded updates).  Reduction runs under jit, which inserts
    the collectives for the sharded sums."""
    import jax
    import jax.numpy as jnp

    from cobaya_tpu.ops import moments as mom_ops
    from cobaya_tpu.parallel.mesh import make_mesh, shard_batch_pytree

    mesh = make_mesh(8)
    C, d = 16, 3
    rng = np.random.default_rng(0)
    xs = rng.normal(size=(C, 40, d)).astype(np.float32)
    # build the accumulator under jit WITH sharded walker state, as the
    # sampler does: s2 updates then include the cross-shard reduction
    m = mom_ops.init(shard_batch_pytree(jnp.asarray(xs[:, 0]), mesh))
    update = jax.jit(mom_ops.update)
    for t in range(40):
        m = update(m, jnp.asarray(xs[:, t]))
    total = jax.jit(mom_ops.reduce_chains)(m)
    host_total = mom_ops.reduce_chains(m)
    assert np.isclose(float(total.count), float(host_total.count))
    assert np.allclose(np.asarray(mom_ops.mean(total)),
                       xs.reshape(-1, d).mean(0), atol=1e-4)
    assert np.allclose(np.asarray(mom_ops.cov(total)),
                       np.asarray(mom_ops.cov(host_total)), atol=1e-4)
