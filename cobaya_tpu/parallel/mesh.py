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
    """A 1D mesh over (up to) all visible devices, axis name 'chains'."""
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
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


def shard_batch_pytree(tree, mesh):
    """Place every leaf with its leading axis sharded over the mesh."""
    import jax

    sharding = chain_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def round_up_chains(n_chains: int, n_devices: int) -> int:
    """Smallest multiple of n_devices >= n_chains."""
    return int(-(-n_chains // n_devices) * n_devices)


def psum_moments(moments, axis_name: str = CHAIN_AXIS):
    """Cross-device reduction of a chain-reduced Moments accumulator.

    To be used inside shard_map after ops.moments.reduce_chains: one psum
    over ICI replaces the reference's MPI allgather of means/covs
    (mpi.py:178-191).
    """
    import jax

    return jax.tree.map(lambda x: jax.lax.psum(x, axis_name), moments)
