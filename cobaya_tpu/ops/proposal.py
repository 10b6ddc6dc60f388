"""Blocked random-direction proposal, functionalized for vmapped walkers.

Capability parity with /root/reference/cobaya/samplers/mcmc/proposal.py
(``BlockedProposer``): parameters are grouped into blocks sorted by descending
cost; the proposal basis is the Cholesky factorization of the covariance
*reordered into block order*, with the per-block transform
``S[j:, j:] @ L[j:, j:j+nb]`` so that moving a slow block drags every faster
parameter while a fast-block move touches only fast parameters.  The radial
kick is the reference's fat-tailed mixture: with prob 1/3 an Exp(1) draw,
else the norm of a min(nb, 2)-dimensional standard Gaussian.  Block visit
order follows a cycler with each block repeated ``oversample * n_block``
times per cycle, reshuffled every cycle.

TPU-first design differences:

* All per-block transforms are padded to dense ``(n_blocks, d, d)`` matrices
  in *parameter* order, so the active block is selected inside jit with one
  gather and the proposal is a single (batched) matvec — no Python state.
* The block schedule is precomputed host-side per epoch and fed to the scan
  as an ``xs`` array (shared across walkers; each walker draws its own
  direction and radius, so walker kernels stay independent).
* Two direction modes.  ``random`` (default): fresh per-walker random unit
  vectors in the block subspace — identical in distribution per step to Haar
  columns and fully decorrelated *across* walkers, which matters when
  thousands of walkers feed the cross-chain R-1 statistics.  ``cycled``:
  the reference's semantics exactly (reference proposal.py:58-82) — cycle
  through the columns of a Haar SO(n) rotation per block, regenerating on
  wrap (``DirectionCycler``); the per-step column is precomputed host-side
  and fed to the scan, shared across walkers (each walker keeps its own
  random sign and radius).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..utils.log import LoggedError, get_logger
from ..utils.tools import choleskyL_corr

log = get_logger("proposal")


class BlockedProposal(NamedTuple):
    """Static (host-built) proposal data, ready to ship to the device.

    All arrays are plain numpy; the sampler converts them to device arrays.
    """

    transforms: np.ndarray  # (n_blocks, d, d): dx_param = T[b] @ (r*e_j)
    dir_mask: np.ndarray  # (n_blocks, d): 1 where j belongs to block b
    block_sizes: np.ndarray  # (n_blocks,)
    scale: float
    i_of_j: np.ndarray  # param index of each ordered (j) position
    blocks: tuple  # tuple of tuples of param indices (ordered slow->fast)
    oversampling_factors: np.ndarray
    covmat: np.ndarray  # the (param-ordered) covariance this was built from


def regularize_learned_covmat(covmat: np.ndarray) -> np.ndarray:
    """Clean a walker-statistics covariance for use as a proposal.

    The per-epoch moment accumulators reduce on device in float32, so a
    covariance learned from them can come back very slightly asymmetric or
    with tiny negative eigenvalues — reduction noise, not structure.
    Symmetrize, and if the most negative eigenvalue is within 1e-4 of the
    largest one (relative), floor the spectrum at 1e-8 * max instead of
    discarding the whole adaptation update.  Genuinely indefinite matrices
    (negative beyond the noise bound) are returned symmetrized only, so the
    strict check in :func:`build_blocked_proposal` still rejects them.
    """
    cov = np.asarray(covmat, dtype=float)
    cov = (cov + cov.T) / 2
    eigs, vecs = np.linalg.eigh(cov)
    emax = float(eigs[-1]) if eigs.size else 0.0
    if emax > 0 and eigs[0] <= 0 and eigs[0] > -1e-4 * emax:
        cov = (vecs * np.maximum(eigs, 1e-8 * emax)) @ vecs.T
        cov = (cov + cov.T) / 2
    return cov


def build_blocked_proposal(
    covmat: np.ndarray,
    blocks_param_indices,
    oversampling_factors=None,
    proposal_scale: float = 2.4,
) -> BlockedProposal:
    """Build the padded per-block transforms from a covariance matrix.

    ``blocks_param_indices``: list of lists of sampled-parameter indices, one
    per block, sorted slowest first.
    """
    covmat = np.asarray(covmat, dtype=float)
    d = covmat.shape[0]
    blocks = [tuple(int(i) for i in b) for b in blocks_param_indices]
    i_of_j = np.array([i for b in blocks for i in b], dtype=int)
    if sorted(i_of_j.tolist()) != list(range(d)):
        raise LoggedError(
            log, "Blocks must partition the %d sampled parameters; got %r",
            d, blocks,
        )
    if not (
        np.allclose(covmat, covmat.T)
        and np.all(np.linalg.eigvalsh(covmat) > 0)
    ):
        raise LoggedError(log, "Proposal covmat not symmetric positive-definite.")
    n_blocks = len(blocks)
    sizes = np.array([len(b) for b in blocks], dtype=int)
    j_starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    cov_j = covmat[np.ix_(i_of_j, i_of_j)]
    S, L = choleskyL_corr(cov_j)
    M = S @ L  # (d, d) lower-triangular in j-space, scaled by stds
    transforms = np.zeros((n_blocks, d, d))
    dir_mask = np.zeros((n_blocks, d))
    for b, (j0, nb) in enumerate(zip(j_starts, sizes)):
        Mb = np.zeros((d, d))
        Mb[j0:, j0:j0 + nb] = M[j0:, j0:j0 + nb]
        # scatter j-rows back to parameter order
        transforms[b][i_of_j] = Mb
        dir_mask[b, j0:j0 + nb] = 1.0
    if oversampling_factors is None:
        oversampling_factors = np.ones(n_blocks, dtype=int)
    else:
        oversampling_factors = np.atleast_1d(oversampling_factors)
        if len(oversampling_factors) != n_blocks:
            raise LoggedError(
                log, "oversampling_factors has %d entries for %d blocks.",
                len(oversampling_factors), n_blocks,
            )
        if not np.all(oversampling_factors == np.round(
                oversampling_factors)):
            raise LoggedError(
                log, "Oversampling factors must be integer! Got %r.",
                list(oversampling_factors),
            )
    return BlockedProposal(
        transforms=transforms,
        dir_mask=dir_mask,
        block_sizes=sizes,
        scale=float(proposal_scale),
        i_of_j=i_of_j,
        blocks=tuple(blocks),
        oversampling_factors=np.asarray(oversampling_factors, dtype=int),
        covmat=covmat,
    )


def make_block_schedule(
    proposal: BlockedProposal, n_steps: int, rng: np.random.Generator,
    only_blocks=None, carryover: list | None = None,
) -> np.ndarray:
    """Block-index sequence for one epoch (reference CyclicIndexRandomizer).

    Each cycle visits block ``b`` ``oversample[b] * n_block[b]`` times, in a
    fresh random permutation.  ``only_blocks`` restricts to a subset (used by
    fast-dragging's separate slow/fast cyclers).  Pass the same one-element
    ``carryover`` list across epochs so a cycle interrupted at an epoch
    boundary resumes where it stopped (the reference cycler persists its
    loop index) — otherwise the dropped tail elements would be
    systematically under-visited whenever the cycle length does not divide
    the epoch length.
    """
    idx = np.arange(len(proposal.blocks))
    if only_blocks is not None:
        idx = np.asarray(only_blocks, dtype=int)
    reps = np.repeat(
        idx,
        (proposal.oversampling_factors[idx] * proposal.block_sizes[idx]).astype(int),
    )
    if len(reps) == 0:
        raise LoggedError(log, "Empty block schedule.")
    out = np.empty(n_steps, dtype=np.int32)
    pos = 0
    remainder = carryover[0] if carryover else None
    if remainder is not None and len(remainder):
        take = min(len(remainder), n_steps)
        out[:take] = remainder[:take]
        remainder = remainder[take:]
        pos = take
    while pos < n_steps:
        cycle = rng.permutation(reps) if len(reps) > 2 else reps
        take = min(len(cycle), n_steps - pos)
        out[pos:pos + take] = cycle[:take]
        remainder = cycle[take:]
        pos += take
    if carryover is not None:
        carryover[0] = remainder if remainder is not None else np.empty(
            0, np.int32)
    return out


def random_SO_N(n: int, rng: np.random.Generator) -> np.ndarray:
    """Haar-distributed special-orthogonal matrix (reference functions.py:21).

    QR of a Gaussian matrix with the R-diagonal sign fix gives Haar O(n);
    flipping one column's sign when det = -1 lands in SO(n).
    """
    if n == 1:
        return np.ones((1, 1))
    A = rng.standard_normal((n, n))
    Q, R = np.linalg.qr(A)
    Q = Q * np.sign(np.diag(R))
    if np.linalg.det(Q) < 0:
        Q[:, 0] = -Q[:, 0]
    return Q


class DirectionCycler:
    """Per-block SO(n) column cycler (reference RandDirectionProposer).

    Host-side state persisting across epochs: for each block, a Haar
    rotation whose columns are proposed in sequence, regenerated when
    exhausted.  ``directions_for(schedule)`` precomputes the per-step unit
    directions (embedded in the d-dim j-space) for one epoch.
    """

    def __init__(self, proposal: BlockedProposal, rng: np.random.Generator):
        self.rng = rng
        self.sizes = [int(s) for s in proposal.block_sizes]
        starts = np.concatenate([[0], np.cumsum(proposal.block_sizes)[:-1]])
        self.starts = [int(s) for s in starts]
        self.d = int(proposal.transforms.shape[-1])
        self._R = [None] * len(self.sizes)
        self._idx = [0] * len(self.sizes)

    def _next_column(self, b: int) -> np.ndarray:
        nb = self.sizes[b]
        if self._R[b] is None or self._idx[b] >= nb:
            self._R[b] = random_SO_N(nb, self.rng)
            self._idx[b] = 0
        col = self._R[b][:, self._idx[b]]
        self._idx[b] += 1
        return col

    def directions_for(self, block_schedule: np.ndarray) -> np.ndarray:
        """(n_steps, d) j-space unit directions for a flat block schedule."""
        out = np.zeros((len(block_schedule), self.d), dtype=np.float32)
        for s, b in enumerate(block_schedule):
            b = int(b)
            j0, nb = self.starts[b], self.sizes[b]
            out[s, j0:j0 + nb] = self._next_column(b)
        return out


def propose_jax(key, x, block_index, transforms, dir_mask, block_sizes, scale,
                direction=None):
    """One proposal for one walker (jittable; vmap over walkers).

    key: PRNG key; x: (d,) current point; block_index: traced int32 scalar
    (shared across walkers in a step); remaining args: device copies of the
    BlockedProposal arrays.  ``direction``: optional precomputed (d,)
    j-space unit direction (cycled mode) — the walker applies a random sign
    to it.  Returns the trial point.
    """
    import jax
    import jax.numpy as jnp

    d = x.shape[-1]
    k_dir, k_u, k_exp, k_gauss = jax.random.split(key, 4)
    mask = dir_mask[block_index]  # (d,)
    nb = block_sizes[block_index]
    if direction is None:
        # fresh unit direction in the block's j-subspace
        g = jax.random.normal(k_dir, (d,), dtype=x.dtype) * mask
        e = g / jnp.maximum(jnp.linalg.norm(g), 1e-30)
    else:
        sign = jnp.where(jax.random.bernoulli(k_dir), 1.0, -1.0)
        e = sign * direction.astype(x.dtype)
    # fat-tailed radial kick: 1/3 Exp(1), 2/3 |N(0, I_min(nb,2))|
    u = jax.random.uniform(k_u)
    r_exp = jax.random.exponential(k_exp, dtype=x.dtype)
    g2 = jax.random.normal(k_gauss, (2,), dtype=x.dtype)
    chi2 = g2[0] ** 2 + jnp.where(nb > 1, g2[1] ** 2, 0.0)
    r = jnp.where(u < 0.33, r_exp, jnp.sqrt(chi2))
    dx = transforms[block_index] @ (scale * r * e)
    return x + dx


def propose_batch(key, X, block_index, transforms, dir_mask, block_sizes,
                  scale, direction=None):
    """Proposals for the whole walker batch in one shot (jittable).

    Batched counterpart of :func:`propose_jax` for the epoch hot loop:
    ONE key feeds batched (C, ...) draws (counter-based bits are i.i.d.
    across walkers), and the per-block triangular transform applies to all
    walkers as a single (C, d) @ (d, d) matmul on the MXU instead of C
    vmapped matvecs.  Same proposal distribution as the reference's
    BlockedProposer (proposal.py:58-82): random block-subspace direction,
    fat-tailed radial kick (1/3 Exp(1), 2/3 2D-Gaussian radius).

    X: (C, d) current points; ``direction``: optional shared (d,) j-space
    unit direction (cycled mode) — each walker applies a random sign.
    """
    import jax
    import jax.numpy as jnp

    C, d = X.shape
    k_dir, k_u, k_exp, k_gauss = jax.random.split(key, 4)
    mask = dir_mask[block_index]  # (d,)
    nb = block_sizes[block_index]
    if direction is None:
        # fresh unit direction in the block's j-subspace, per walker
        g = jax.random.normal(k_dir, (C, d), dtype=X.dtype) * mask
        e = g / jnp.maximum(
            jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-30)
    else:
        sign = jnp.where(jax.random.bernoulli(k_dir, shape=(C,)),
                         jnp.asarray(1.0, X.dtype),
                         jnp.asarray(-1.0, X.dtype))
        e = sign[:, None] * direction.astype(X.dtype)[None, :]
    # fat-tailed radial kick: 1/3 Exp(1), 2/3 |N(0, I_min(nb,2))|
    u = jax.random.uniform(k_u, (C,))
    r_exp = jax.random.exponential(k_exp, (C,), dtype=X.dtype)
    g2 = jax.random.normal(k_gauss, (C, 2), dtype=X.dtype)
    chi2 = g2[:, 0] ** 2 + jnp.where(nb > 1, g2[:, 1] ** 2, 0.0)
    r = jnp.where(u < 0.33, r_exp, jnp.sqrt(chi2))
    DX = (scale * r[:, None] * e) @ transforms[block_index].T
    return X + DX
