"""Harvest the flagship proposal covmat.

Writes the packaged ``cobaya_tpu/theories/emulator/flagship.covmat`` in the
reference text covmat format ('# names' header + matrix rows) consumed by
``benchmodel.proposal_covmat`` — the exact analogue of the covmat files
real analyses ship alongside their chains (reference covmat database,
/root/reference/cobaya/cosmo_input/covmats).

Two sources:

- ``laplace`` (default): Laplace approximation at the synthetic truth —
  the posterior Hessian of the flagship model, eigenvalue-regularized in
  proposal-width units so no direction's sigma exceeds ~3 diagonal
  proposal widths.  Deterministic and cheap; this is how the packaged
  file is produced.
- a diagnostics-run npz (arrays ``n`` (epochs,), ``moc``/``com``
  (epochs, d, d): mean-of-within-walker-covariances and covariance of
  walker means at each convergence check, as written by a
  ``callback_function`` run): harvests the last epoch's within-walker
  covariance from a converged run.

Run:  python scripts/make_flagship_covmat.py [laplace | /path/to/hist.npz]
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _write(cov: np.ndarray, names: list, provenance: str) -> str:
    from cobaya_tpu.theories.emulator import benchmodel as bm

    cov = (cov + cov.T) / 2
    # guard: positive-definite after symmetrization (regularize tiny
    # negative eigenvalues from single-epoch noise)
    w, v = np.linalg.eigh(cov)
    floor = 1e-12 * w.max()
    if w.min() < floor:
        cov = (v * np.maximum(w, floor)) @ v.T
    out = bm.COVMAT_FILE
    with open(out, "w", encoding="utf-8") as f:
        f.write("# " + " ".join(names) + "\n")
        np.savetxt(f, cov)
    sig = np.sqrt(np.diag(cov))
    print(f"wrote {out} ({provenance})")
    for p, s in zip(names, sig):
        print(f"  {p:12s} sigma={s:.4g}")
    return out


def from_npz(npz_path: str) -> str:
    """Last-epoch within-walker covariance of a diagnostics run."""
    from cobaya_tpu.theories.emulator import benchmodel as bm

    with np.load(npz_path) as z:
        moc = np.asarray(z["moc"][-1], float)  # within-walker covariance
        n = int(np.asarray(z["n"])[-1])
    names = bm.sampled_names()
    if moc.shape != (len(names),) * 2:
        raise SystemExit(
            f"covariance shape {moc.shape} != ({len(names)},)x2")
    return _write(moc, names, f"converged-run epoch at n={n} steps/walker")


def from_laplace() -> str:
    """Laplace approximation at truth (CPU, f64)."""
    os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from cobaya_tpu.models.model import get_model
    from cobaya_tpu.theories.emulator import benchmodel as bm

    info = bm.flagship_info("/tmp/cobaya_tpu_bench_data")
    model = get_model(info)
    fn = model.make_logposterior_fn()
    names = bm.sampled_names()
    x0 = jnp.asarray([bm.TRUTH[p] for p in names], jnp.float64)

    def logp(x):
        out = fn(x)
        return out[0] if isinstance(out, tuple) else out

    print("logp(truth) =", float(logp(x0)))
    H = np.asarray(jax.hessian(logp)(x0), float)
    H = (H + H.T) / 2
    # diagonal proposal widths set the regularization floor per direction:
    # scale to unit widths, clip curvature eigenvalues from below, invert
    cov0, _ = bm.proposal_covmat(packaged=False)
    w0 = np.sqrt(np.diag(cov0))
    Hs = -H * np.outer(w0, w0)  # curvature in proposal-width units
    ev, V = np.linalg.eigh(Hs)
    print("curvature eigvals (width units):", np.round(ev[:8], 3), "...",
          np.round(ev[-3:], 1))
    # floor: sigma along any direction never exceeds ~3 proposal widths
    ev_reg = np.maximum(ev, 1.0 / 3.0**2)
    Cs = (V / ev_reg) @ V.T
    return _write(Cs * np.outer(w0, w0), names, "Laplace at truth")


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "laplace"
    if arg == "laplace":
        from_laplace()
    else:
        from_npz(arg)
