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


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_moments_psum_reduction_matches_host():
    """shard_map + psum of chain-reduced moments == host-side reduction."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from jax.sharding import PartitionSpec as P

    from cobaya_tpu.ops import moments as mom_ops
    from cobaya_tpu.parallel.mesh import make_mesh, shard_batch_pytree

    mesh = make_mesh(8)
    C, d = 16, 3
    rng = np.random.default_rng(0)
    xs = rng.normal(size=(C, 40, d)).astype(np.float32)
    m = mom_ops.init(jnp.asarray(xs[:, 0]))
    for t in range(40):
        m = mom_ops.update(m, jnp.asarray(xs[:, t]))
    m_sharded = shard_batch_pytree(m, mesh)

    @partial(jax.shard_map, mesh=mesh, in_specs=P("chains"), out_specs=P())
    def global_reduce(mm):
        local = mom_ops.reduce_chains(mm)
        return jax.tree.map(lambda v: jax.lax.psum(v, "chains"), local)

    total = global_reduce(m_sharded)
    host_total = mom_ops.reduce_chains(m)
    assert np.isclose(float(total.count), float(host_total.count))
    assert np.allclose(np.asarray(mom_ops.mean(total)),
                       xs.reshape(-1, d).mean(0), atol=1e-4)
    assert np.allclose(np.asarray(mom_ops.cov(total)),
                       np.asarray(mom_ops.cov(host_total)), atol=1e-4)
