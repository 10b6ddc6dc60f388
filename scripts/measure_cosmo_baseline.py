"""Measure the reference (cobaya) CPU throughput on the flagship
cosmology posterior.

Runs the reference sampler from /root/reference on exactly the same
Planck-like synthetic posterior as bench.py's "cosmo" row:
the posterior is exposed to the reference as one external likelihood
callable that evaluates cobaya_tpu's *eager numpy* pipeline (surrogate
theory + plik-lite + CamSpec foregrounds + BAO + SN) — the same math the
reference would run with its own host-side likelihoods, so the comparison
isolates sampler/runtime throughput on identical numerics.

Writes bench_cosmo_baseline.json at the repo root, consumed by bench.py.

Run:  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python scripts/measure_cosmo_baseline.py [seconds]
"""

import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, "/root/reference")

# --- minimal stubs for unavailable optional deps (getdist, portalocker) ---
getdist = types.ModuleType("getdist")
getdist.chains = types.ModuleType("getdist.chains")
getdist.chains.chainFiles = lambda *a, **k: []


class _WeightedSamples:
    def __init__(self, *a, **k):
        pass


getdist.chains.WeightedSamples = _WeightedSamples
getdist.chains.WeightedSampleError = type(
    "WeightedSampleError", (Exception,), {})
getdist.ParamNames = object
getdist.mcsamples = types.ModuleType("getdist.mcsamples")
getdist.mcsamples.MCSamplesError = RuntimeError


class _MCSamplesStub:
    def __init__(self, *a, **k):
        raise RuntimeError("getdist stub: CL bounds disabled")


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


def main(budget_s: float = 120.0):
    from cobaya_tpu.models.model import get_model as get_model_tpu
    from cobaya_tpu.theories.emulator import benchmodel as bm

    info_tpu = bm.flagship_info("/tmp/cobaya_tpu_bench_data")
    model_tpu = get_model_tpu(info_tpu)
    order = bm.sampled_names()
    assert order == list(model_tpu.parameterization.sampled_params())

    n_evals = [0]

    def loglike_ext(**kw):
        n_evals[0] += 1
        x = np.array([kw[p] for p in order], float)
        return float(np.sum(model_tpu.logposterior(
            x, return_derived=False).loglikes))

    from cobaya.model import get_model
    from cobaya.sampler import get_sampler

    # same sampled/fixed split + dispersed refs as the TPU run (the fixed
    # CIB-shape params are inputs of the device pipeline, not the external
    # callable, so they are simply dropped here)
    params = {p: v for p, v in info_tpu["params"].items()
              if p in order}
    info = {
        "params": params,
        # same external priors (e.g. the SZ combination) as the TPU run,
        # so both frameworks sample the identical posterior
        "prior": dict(bm.EXTERNAL_PRIORS),
        "likelihood": {"flagship": {
            "external": loglike_ext,
            "input_params": order,
        }},
    }
    model = get_model(info)
    covmat, covmat_params = bm.proposal_covmat()
    sampler_info = {"mcmc": {
        "covmat": covmat, "covmat_params": covmat_params,
        "learn_proposal": True, "measure_speeds": False,
        "max_samples": 10 ** 9, "Rminus1_stop": 0.01, "seed": 1,
        "Rminus1_cl_stop": 1e6,
    }}
    mcmc = get_sampler(sampler_info, model)

    # The posterior is expensive on CPU (~1 eval/s): a full ESS
    # measurement is impractical, so this script measures eval
    # *throughput* over the budget.  bench.py converts it to a baseline
    # ESS/s using the TPU run's measured ESS/eval — valid because both
    # run the same adaptive Metropolis algorithm on the same posterior,
    # so ESS per posterior evaluation is a property of the algorithm +
    # posterior, not of the hardware.
    t0 = time.time()
    slice_samples = 20
    total_accepted = 0
    while time.time() - t0 < budget_s:
        mcmc.max_samples = total_accepted + slice_samples
        try:
            mcmc.run()
        except Exception as exc:
            print("stopped:", exc)
            break
        total_accepted = len(mcmc.collection)
    elapsed = time.time() - t0
    coll = mcmc.collection
    weights = coll["weight"].to_numpy()
    n_evals = int(weights.sum()) + getattr(mcmc, "burn_in_left", 0)
    result = {
        "framework": "cobaya (reference)",
        "config": ("24-sampled-param Planck-like synthetic cosmology "
                   "(surrogate theory, eager numpy likelihoods), "
                   "adaptive MCMC, 1 chain, CPU"),
        "elapsed_s": elapsed,
        "accepted": len(coll),
        "posterior_evals": n_evals,
        "evals_per_s": n_evals / elapsed,
        "note": ("evals/s only; bench.py derives baseline ESS/s as "
                 "evals_per_s x the TPU run's ESS/eval (same algorithm, "
                 "same posterior)"),
    }
    print(json.dumps(result, indent=2))
    with open(os.path.join(REPO, "bench_cosmo_baseline.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 120.0)
