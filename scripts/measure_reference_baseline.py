"""Measure the reference (cobaya) single-node MCMC throughput baseline.

Runs the reference sampler from /root/reference on the BASELINE 50-D
correlated-Gaussian posterior (CPU, its native target), with minimal stubs
for its optional heavy deps (getdist, portalocker) that this image lacks.
Writes bench_baseline.json at the repo root, consumed by bench.py.

Run:  python scripts/measure_reference_baseline.py [seconds]
"""

import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, "/root/reference")

# --- minimal stubs for unavailable optional deps ---------------------------
getdist = types.ModuleType("getdist")
getdist.MCSamples = object
getdist.chains = types.ModuleType("getdist.chains")
getdist.chains.chainFiles = lambda *a, **k: []


class _WeightedSamples:
    def __init__(self, *a, **k):
        pass


getdist.chains.WeightedSamples = _WeightedSamples
getdist.chains.WeightedSampleError = type(
    "WeightedSampleError", (Exception,), {}
)
getdist.ParamNames = object
getdist.mcsamples = types.ModuleType("getdist.mcsamples")


class _MCSamplesStub:  # only used by the CL-bound convergence branch
    def __init__(self, *a, **k):
        raise RuntimeError("getdist stub: CL bounds disabled in baseline run")


getdist.mcsamples.MCSamplesError = RuntimeError
getdist.MCSamples = _MCSamplesStub
getdist.__version__ = "0.0-stub"
sys.modules["getdist"] = getdist
sys.modules["getdist.chains"] = getdist.chains
sys.modules["getdist.mcsamples"] = getdist.mcsamples

portalocker = types.ModuleType("portalocker")


class _Lock:
    def __init__(self, *a, **k):
        pass

    def acquire(self, *a, **k):
        pass

    def release(self):
        pass


portalocker.Lock = _Lock
portalocker.exceptions = types.ModuleType("portalocker.exceptions")
portalocker.exceptions.LockException = RuntimeError
portalocker.LOCK_EX = 2
portalocker.LOCK_NB = 4
portalocker.lock = lambda *a, **k: None
portalocker.unlock = lambda *a, **k: None
sys.modules["portalocker"] = portalocker
sys.modules["portalocker.exceptions"] = portalocker.exceptions


def main(budget_s: float = 60.0):
    dim = 50
    rng = np.random.default_rng(0)
    q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
    eigs = np.geomspace(0.01, 1.0, dim)
    cov = (q * eigs) @ q.T
    cov = (cov + cov.T) / 2

    from cobaya.model import get_model
    from cobaya.sampler import get_sampler

    info = {
        "params": {
            f"x{i}": {"prior": {"dist": "norm", "loc": 0, "scale": 3},
                      "ref": 0.0}
            for i in range(dim)
        },
        "likelihood": {
            "gaussian_mixture": {
                "means": [np.zeros(dim).tolist()],
                "covs": [cov.tolist()],
                "input_params_prefix": "x",
            }
        },
    }
    model = get_model(info)
    sampler_info = {"mcmc": {
        "covmat": cov, "covmat_params": [f"x{i}" for i in range(dim)],
        "learn_proposal": True, "measure_speeds": False,
        "max_samples": 10**9, "Rminus1_stop": 0.01, "seed": 1,
        # disable the getdist-based CL-bound criterion
        "Rminus1_cl_stop": 1e6,
    }}
    sampler = get_sampler(sampler_info, model)
    mcmc = sampler

    # run the real step loop for a fixed wall-time budget
    t0 = time.time()
    n_evals = 0
    # drive via the public API: run with max_samples grown in slices
    from cobaya.samplers.mcmc.mcmc import MCMC

    # monkey-patch: stop after budget by bounding max_samples per slice
    slice_samples = 2000
    total_accepted = 0
    while time.time() - t0 < budget_s:
        mcmc.max_samples = total_accepted + slice_samples
        try:
            mcmc.run()
        except Exception as exc:  # convergence reached or stop condition
            print("stopped:", exc)
            break
        total_accepted = len(mcmc.collection)
    elapsed = time.time() - t0
    coll = mcmc.collection
    n_accepted = len(coll)
    weights = coll["weight"].to_numpy()
    n_evals = int(weights.sum())
    # ESS via autocorrelation of the expanded chain (first parameter set)
    x = coll[[f"x{i}" for i in range(dim)]].to_numpy()
    x_full = np.repeat(x, weights.astype(int), axis=0)
    n = len(x_full)
    half = x_full[n // 2:]
    ess_per_dim = []
    for j in range(dim):
        v = half[:, j] - half[:, j].mean()
        f = np.fft.rfft(v, 2 * len(v))
        acf = np.fft.irfft(f * np.conj(f))[: len(v)]
        acf /= acf[0]
        # Geyer initial positive sequence
        tau = 1.0
        for k in range(1, min(len(acf) - 1, 10000), 2):
            pair = acf[k] + acf[k + 1]
            if pair < 0:
                break
            tau += 2 * pair
        ess_per_dim.append(len(v) / tau)
    ess = float(np.median(ess_per_dim))
    # scale ESS to the full run duration (we measured on second half)
    ess_rate = ess / (elapsed / 2)
    result = {
        "framework": "cobaya (reference)",
        "config": "50-D correlated Gaussian, adaptive MCMC, 1 chain, CPU",
        "elapsed_s": elapsed,
        "accepted": n_accepted,
        "posterior_evals": n_evals,
        "evals_per_s": n_evals / elapsed,
        "ess_median": ess,
        "ess_per_s": ess_rate,
    }
    print(json.dumps(result, indent=2))
    out_path = os.path.join(os.path.dirname(__file__), "..",
                            "bench_baseline.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 60.0)
