"""Device-mesh utilities: sharded walker batches over chips.

The reference's distributed backend is MPI with one chain per rank
(/root/reference/cobaya/mpi.py); here multi-chain parallelism is data
parallelism over a ``jax.sharding.Mesh`` with one axis, ``chains``.  The
walker state (every leaf of the MCMC carry, leading dim = n_chains) is
sharded across devices; the jitted epoch scan runs SPMD; the per-epoch chain
statistics reduce either on host (single-process) or with one ``psum`` over
ICI (multi-host).  There is no per-step communication at all — the
capability the reference gets from MPI allgather at learn points is a single
small collective here.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..utils.log import get_logger

log = get_logger("parallel")

CHAIN_AXIS = "chains"


def make_mesh(n_devices: Optional[int] = None, devices=None):
    """A 1D mesh over (up to) this process's devices, axis name 'chains'.

    In a multi-process run each process drives its OWN chips with its own
    walker population (cross-process statistics pool through the
    coordination service, see ``parallel.state``), so the mesh spans only
    addressable devices.
    """
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.local_devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (CHAIN_AXIS,))


def chain_sharding(mesh):
    """NamedSharding: shard the leading (chains) axis, replicate the rest."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(CHAIN_AXIS))


def replicated(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P())


def shard_batch_pytree(tree, mesh, batch_size: Optional[int] = None):
    """Place leaves with a leading chains axis sharded over the mesh.

    Leaves WITHOUT the batch leading dim (e.g. the pooled (d, d) second
    moment, PRNG key leaves of odd shape) are replicated: inside shard_map
    each device accumulates its local walkers' contribution and the pooled
    values combine with one psum (see ops.moments).
    """
    import jax

    sharding = chain_sharding(mesh)
    repl = replicated(mesh)
    if batch_size is None:
        sizes = [x.shape[0] for x in jax.tree.leaves(tree)
                 if getattr(x, "ndim", 0) >= 1]
        batch_size = max(sizes, key=sizes.count) if sizes else None

    def place(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == batch_size:
            return jax.device_put(x, sharding)
        return jax.device_put(x, repl)

    return jax.tree.map(place, tree)


def round_up_chains(n_chains: int, n_devices: int) -> int:
    """Smallest multiple of n_devices >= n_chains."""
    return int(-(-n_chains // n_devices) * n_devices)


def psum_moments(moments, axis_name: str = CHAIN_AXIS):
    """Cross-device reduction of a chain-reduced Moments accumulator, for
    shard_map pipelines where each shard accumulated ONLY its local
    walkers (count/s1 AND the pooled s2 all shard-local): one psum over
    ICI replaces the reference's MPI allgather of means/covs
    (mpi.py:178-191).  Under jit auto-sharding (the samplers' mode) the
    pooled s2 is already globally consistent — reduce with
    ``jax.jit(ops.moments.reduce_chains)`` instead.
    """
    import jax

    return jax.tree.map(lambda x: jax.lax.psum(x, axis_name), moments)
