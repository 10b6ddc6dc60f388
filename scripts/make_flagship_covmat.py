"""Harvest the flagship proposal covmat from a converged run's statistics.

Takes the npz history written by a diagnostics run (arrays ``n`` (epochs,),
``moc``/``com`` (epochs, d, d): mean-of-within-walker-covariances and
covariance-of-walker-means at each convergence check) and writes the
packaged ``cobaya_tpu/theories/emulator/flagship.covmat`` in the reference
text covmat format ('# names' header + matrix rows) consumed by
``benchmodel.proposal_covmat`` — the exact analogue of the covmat files
real analyses ship alongside their chains (reference covmat database,
/root/reference/cobaya/cosmo_input/covmats).

Run:  python scripts/make_flagship_covmat.py /tmp/diag_hist_r3.npz
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(npz_path: str) -> str:
    from cobaya_tpu.theories.emulator import benchmodel as bm

    with np.load(npz_path) as z:
        moc = np.asarray(z["moc"][-1], float)  # within-walker covariance
        n = int(np.asarray(z["n"])[-1])
    names = bm.sampled_names()
    if moc.shape != (len(names),) * 2:
        raise SystemExit(
            f"covariance shape {moc.shape} != ({len(names)},)x2")
    cov = (moc + moc.T) / 2
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
    print(f"wrote {out} from epoch at n={n} steps/walker")
    for p, s in zip(names, sig):
        print(f"  {p:12s} sigma={s:.4g}")
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/diag_hist_r3.npz")
