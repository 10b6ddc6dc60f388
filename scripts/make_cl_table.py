"""Build a (phase-aligned, PCA-compressed) Cl table for EmulatorCosmology.

The production pathway for the device-resident CMB theory: tabulate D_l from
a real Boltzmann code on the sampled-parameter grid, compress, and ship the
``.npz`` that ``theory: {emulator: {cl_mode: table, table_file: ...}}``
loads.  Two sources:

- ``camb`` — real CAMB (the product contract the surrogate mirrors,
  /root/reference/cobaya/theories/camb/camb.py:675-774).  Needs
  ``pip install camb``; a 4^6-node lmax=2810 table is ~4096 CAMB calls
  (hours on one CPU; parallelize with --jobs).
- ``analytic`` — the built-in acoustic source (no external code; exercises
  the identical table format/pathway; this is how the committed test
  artifact is produced).

The phase alignment (rows tabulated at l' = l * lA/lA_ref) uses THIS
repo's exact-background acoustic scale for the warp coordinate in both
build and evaluation, so it cancels identically regardless of the source.
The physical EE reionization bump is subtracted at build (it lives at
fixed ell, not fixed phase) and restored analytically at evaluation; for a
CAMB source the restored bump is the surrogate's analytic model, leaving a
documented low-ell EE residual (quantified by tests/test_camb_table.py
when CAMB is installed).

Run:  python scripts/make_cl_table.py out.npz --source camb --lmax 2810 \
          --grid-nodes 4 [--jobs 8]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

SPECS = ("tt", "te", "ee", "bb", "pp")


def camb_row(args):
    """One CAMB evaluation -> {spec: D_l at the requested (fractional)
    ells}.  Module-level so multiprocessing can pickle it."""
    point, row_ells, lmax_int = args
    import camb
    from scipy.interpolate import CubicSpline

    pars = camb.set_params(
        ombh2=point["ombh2"], omch2=point["omch2"], H0=point["H0"],
        tau=point["tau"], As=float(np.exp(point["logA"])) * 1e-10,
        ns=point["ns"], mnu=point.get("mnu", 0.06),
        lmax=lmax_int + 300, lens_potential_accuracy=1,
    )
    res = camb.get_results(pars)
    powers = res.get_cmb_power_spectra(pars, CMB_unit="muK", raw_cl=False)
    tot = powers["total"]          # (L, 4): TT EE BB TE, D_l muK^2
    pp = powers["lens_potential"]  # (L, 3): [l(l+1)]^2 C_l^pp / 2pi first
    L = min(tot.shape[0], lmax_int + 1)
    ells_int = np.arange(L, dtype=float)
    grids = {"tt": tot[:L, 0], "ee": tot[:L, 1], "bb": tot[:L, 2],
             "te": tot[:L, 3], "pp": pp[:L, 0]}
    out = {}
    for spec, vec in grids.items():
        spl = CubicSpline(ells_int, vec)
        out[spec] = spl(np.clip(row_ells, 0.0, L - 1.0))
    return out


def make_camb_source(jobs: int = 0):
    """A ``source(params, ells, xp, ...)`` callable backed by real CAMB.

    Drop-in for :func:`cobaya_tpu.theories.emulator.cmbspec.acoustic_cls`
    in ``ClEmulator.build``: evaluates every grid row with CAMB and
    subtracts the analytic EE reionization bump (restored at evaluation).
    """
    from cobaya_tpu.theories.emulator import cmbspec as cs

    def source(params, ells, xp, include_reion_bump=True, hard_zero=True):
        n = len(np.atleast_1d(params["H0"]))
        ells = np.asarray(ells, float)
        rows_ells = ells if ells.ndim == 2 else np.broadcast_to(
            ells, (n, ells.shape[-1]))
        lmax_int = int(np.ceil(rows_ells.max()))
        points = [{k: float(np.atleast_1d(v)[i]) for k, v in params.items()}
                  for i in range(n)]
        tasks = [(points[i], rows_ells[i], lmax_int) for i in range(n)]
        if jobs and jobs > 1:
            import multiprocessing as mp

            with mp.get_context("spawn").Pool(jobs) as pool:
                rows = pool.map(camb_row, tasks)
        else:
            rows = [camb_row(t) for t in tasks]
            if n > 8:
                print(f"  ... {n} CAMB calls done", file=sys.stderr)
        out = {s: np.stack([r[s] for r in rows]) for s in SPECS}
        if not include_reion_bump:
            # the table pathway restores the analytic bump at evaluation:
            # remove the physical one here so it is not double counted
            for i in range(n):
                out["ee"][i] -= np.asarray(cs.ee_reion_bump(
                    points[i], rows_ells[i], np))
        return out

    return source


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", help="output .npz table path")
    ap.add_argument("--source", choices=("camb", "analytic"),
                    default="camb")
    ap.add_argument("--lmax", type=int, default=2810)
    ap.add_argument("--grid-nodes", type=int, default=4)
    ap.add_argument("--n-pca", type=int, default=40)
    ap.add_argument("--ell-stride", type=int, default=6)
    ap.add_argument("--mnu", type=float, default=0.06)
    ap.add_argument("--jobs", type=int, default=0,
                    help="parallel CAMB workers (0 = serial)")
    ns = ap.parse_args()

    from cobaya_tpu.theories.emulator import cmbspec as cs
    from cobaya_tpu.theories.emulator.emulator import DEFAULT_RANGES

    if ns.source == "camb":
        try:
            import camb  # noqa: F401
        except ImportError:
            raise SystemExit("--source camb needs `pip install camb`")
        source = make_camb_source(ns.jobs)
    else:
        source = cs.acoustic_cls
    n_rows = ns.grid_nodes ** len(DEFAULT_RANGES)
    print(f"building {ns.grid_nodes}^{len(DEFAULT_RANGES)} = {n_rows}-row "
          f"table, lmax={ns.lmax}, source={ns.source}")
    table = cs.ClEmulator.build(
        {p: tuple(r) for p, r in DEFAULT_RANGES.items()},
        lmax=ns.lmax, grid_nodes=ns.grid_nodes, n_pca=ns.n_pca,
        source=source, fixed={"mnu": ns.mnu}, ell_stride=ns.ell_stride,
    )
    table.save(ns.out)
    size = os.path.getsize(ns.out) / 1e6
    print(f"wrote {ns.out} ({size:.1f} MB)")


if __name__ == "__main__":
    main()
