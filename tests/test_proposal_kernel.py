"""Proposal kernel semantics: batched vs per-walker draws.

``propose_batch`` is the epoch hot-loop form (one key, (C, d) @ (d, d)
transform matmul); ``propose_jax`` the per-walker form used by dragging.
Both must realize the reference BlockedProposer distribution
(/root/reference/cobaya/samplers/mcmc/proposal.py:58-82,226-260): moves in
the chosen block's subspace through the block-triangular Cholesky
transform (slow moves drag fast params; fast moves leave slow params
untouched), with the fat-tailed exponential/2D-Gaussian radial mixture.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from cobaya_tpu.ops.proposal import (  # noqa: E402
    build_blocked_proposal,
    propose_batch,
    propose_jax,
)


@pytest.fixture(scope="module")
def prop():
    rng = np.random.default_rng(0)
    d = 6
    A = rng.normal(size=(d, d))
    cov = A @ A.T + d * np.eye(d)
    # blocks: slow = params [0,1,2], fast = params [3,4,5]
    return build_blocked_proposal(cov, [[0, 1, 2], [3, 4, 5]],
                                  proposal_scale=2.4)


def _dev(prop):
    return (jnp.asarray(prop.transforms), jnp.asarray(prop.dir_mask),
            jnp.asarray(prop.block_sizes, jnp.int32),
            jnp.asarray(prop.scale))


def test_batch_footprint(prop):
    """Fast-block moves touch only fast params; slow moves may touch all."""
    args = _dev(prop)
    C, d = 128, 6
    X = jnp.zeros((C, d))
    dx_fast = propose_batch(jax.random.key(1), X, 1, *args)
    assert np.allclose(np.asarray(dx_fast)[:, :3], 0.0)
    assert np.all(np.abs(np.asarray(dx_fast)[:, 3:]).sum(1) > 0)
    dx_slow = propose_batch(jax.random.key(2), X, 0, *args)
    # triangular transform: slow moves drag the fast subspace too
    assert np.all(np.abs(np.asarray(dx_slow)).sum(1) > 0)
    assert np.abs(np.asarray(dx_slow)[:, :3]).sum() > 0


def test_batch_matches_per_walker_distribution(prop):
    """Same radial/direction mixture: first+second moments agree."""
    args = _dev(prop)
    C, d = 20000, 6
    X = jnp.zeros((C, d))
    batch = np.asarray(propose_batch(jax.random.key(3), X, 0, *args))
    keys = jax.random.split(jax.random.key(4), C)
    single = np.asarray(jax.vmap(
        propose_jax, in_axes=(0, 0, None, None, None, None, None)
    )(keys, X, 0, *args))
    # zero-mean displacements in both forms
    se = batch.std(0) / np.sqrt(C)
    assert np.allclose(batch.mean(0), 0.0, atol=4 * se.max())
    assert np.allclose(single.mean(0), 0.0, atol=4 * se.max())
    # second moments of the proposal agree within MC error
    cb, cs = np.cov(batch.T), np.cov(single.T)
    scale = np.sqrt(np.outer(np.diag(cs), np.diag(cs))).max()
    assert np.allclose(cb, cs, atol=0.08 * scale)


def test_cycled_direction_signs(prop):
    """Cycled mode: walkers apply random signs to the shared direction."""
    args = _dev(prop)
    C, d = 4096, 6
    X = jnp.zeros((C, d))
    e = np.zeros(d, np.float32)
    e[3] = 1.0  # fast-block j-space unit direction
    dx = np.asarray(propose_batch(jax.random.key(5), X, 1, *args,
                                  direction=jnp.asarray(e)))
    # every move is along +-(transform @ e): rank-1 displacement set
    norms = np.linalg.norm(dx, axis=1)
    assert np.all(norms > 0)
    unit = dx / norms[:, None]
    ref = unit[0]
    dots = unit @ ref
    assert np.allclose(np.abs(dots), 1.0, atol=1e-5)
    # both signs occur with roughly equal frequency
    frac = (dots > 0).mean()
    assert 0.45 < frac < 0.55


def test_radial_mixture_tail(prop):
    """The exponential third of the mixture produces the fat tail."""
    args = _dev(prop)
    C = 50000
    X = jnp.zeros((C, 6))
    dx = np.asarray(propose_batch(jax.random.key(6), X, 0, *args))
    # whitened radius: invert the slow-block transform on the slow coords
    T = np.asarray(prop.transforms)[0]  # (d, d), columns 0:3 active
    r = np.linalg.lstsq(T * float(prop.scale), dx.T, rcond=None)[0]
    radius = np.linalg.norm(r, axis=0)
    # P(R > 4) for pure 2D-Gaussian radius ~ exp(-8) ~ 3e-4; the 1/3
    # exponential component lifts it to ~ exp(-4)/3 ~ 6e-3
    assert (radius > 4.0).mean() > 2e-3

def test_regularize_learned_covmat():
    """f32-reduction noise (tiny negative eigenvalues, slight asymmetry)
    must be repaired; genuinely indefinite matrices must pass through
    un-fixed so the strict proposal check still rejects them."""
    from cobaya_tpu.ops.proposal import (
        build_blocked_proposal,
        regularize_learned_covmat,
    )

    rng = np.random.default_rng(21)
    A = rng.normal(size=(10, 10))
    C = A @ A.T
    w, V = np.linalg.eigh(C)
    w[0] = -1e-7 * w[-1]
    noisy = (V * w) @ V.T + 1e-13 * rng.normal(size=(10, 10))
    fixed = regularize_learned_covmat(noisy)
    assert np.all(np.linalg.eigvalsh(fixed) > 0)
    assert np.allclose(fixed, fixed.T)
    # the repair only moves the noise-level eigenvalue: the matrix stays
    # within O(|clipped eigenvalue|) of the input
    assert np.max(np.abs(fixed - (noisy + noisy.T) / 2)) < 1e-5 * w[-1]
    build_blocked_proposal(fixed, [list(range(10))])  # must not raise
    w[0] = -0.1 * w[-1]
    still_bad = regularize_learned_covmat((V * w) @ V.T)
    assert np.linalg.eigvalsh(still_bad)[0] < 0
    with pytest.raises(Exception):
        build_blocked_proposal(still_bad, [list(range(10))])
