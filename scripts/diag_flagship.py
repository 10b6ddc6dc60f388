"""Flagship-model convergence diagnostics: R-1 trajectory + per-param
between/within variance breakdown.

Runs the bench.py cosmo row's exact model with a per-epoch callback that
prints the R-1 trajectory, the learned/initial proposal-width ratios for
the cosmology block, and the top sqrt(B/W) offenders (the parameters whose
between-walker variance dominates — the first place a degeneracy or a bad
start distribution shows up).  Also streams the epoch statistics to an npz
(``n``, ``moc``, ``com``) consumable by ``make_flagship_covmat.py``.

Run (CPU):  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/diag_flagship.py [walkers] [max_samples] [epochs] [out.npz]
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import bench
    from cobaya_tpu.models.model import get_model
    from cobaya_tpu.samplers.sampler import get_sampler

    n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    max_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 40000
    max_epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    out = sys.argv[4] if len(sys.argv) > 4 else "/tmp/diag_hist.npz"

    info, bm = bench.build_cosmo_info(n_chains)
    info["sampler"]["mcmc"]["max_samples"] = max_samples
    names = bm.sampled_names()
    covmat0, _ = bm.proposal_covmat()
    t_start = time.time()
    hist = []

    def cb(s):
        st = s._last_stats
        moc, com = st["mean_of_covs"], st["cov_of_means"]
        hist.append((s.n_steps, moc.copy(), com.copy()))
        np.savez(out, n=[h[0] for h in hist],
                 moc=[h[1] for h in hist], com=[h[2] for h in hist])
        ratio0 = np.sqrt(np.diag(moc)[:6] / np.diag(covmat0)[:6])
        print("   learned/initial std (cosmo block):",
              np.round(ratio0, 3), flush=True)
        dW, dB = np.diag(moc), np.diag(com)
        ratio = np.sqrt(dB / np.maximum(dW, 1e-300))
        order = np.argsort(ratio)[::-1][:5]
        top = ", ".join(f"{names[i]}:{ratio[i]:.2f}" for i in order)
        acc = s._total_accepted_mean / max(s.n_steps, 1)
        print(f"[diag t={time.time() - t_start:7.1f}s] n={s.n_steps} "
              f"R-1={s.Rminus1_last:.3g} acc={acc:.3f} "
              f"minW={dW.min():.3g} negW={int((dW <= 0).sum())} "
              f"top sqrt(B/W): {top}", flush=True)
        if max_epochs and len(hist) >= max_epochs:
            s.converged = True  # stop the run loop cleanly

    info["sampler"]["mcmc"]["callback_function"] = cb
    info["sampler"]["mcmc"]["callback_every"] = 1

    model = get_model({k: v for k, v in info.items() if k != "sampler"})
    sampler = get_sampler(info["sampler"], model)
    sampler.run()
    print("converged:", sampler.converged, "R-1:", sampler.Rminus1_last)


if __name__ == "__main__":
    main()
