"""Flagship on-device cosmology: Planck-like 24-parameter inference.

Builds the benchmark model shared with ``bench.py`` — a device-resident
Boltzmann surrogate theory feeding synthetic plik-lite + CamSpec(+foregrounds)
+ BAO + SN likelihoods, all evaluated inside one jitted program — and samples
it with the adaptive blocked-Metropolis sampler.

Run on CPU (small, a few minutes):

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/flagship_cosmology.py --n-chains 64 --max-samples 2000

On a TPU chip, drop the env overrides and raise --n-chains (the bench uses
8192).  Reference workload analogue: the Planck-baseline presets of
/root/reference/cobaya/cosmo_input/input_database.py.
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cobaya_tpu.theories.emulator import benchmodel as bm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-chains", type=int, default=64)
    ap.add_argument("--max-samples", type=int, default=2000)
    ap.add_argument("--max-wall", type=float, default=None,
                    help="wall-clock budget in seconds")
    ap.add_argument("--output", default=None, help="chain file prefix")
    ns = ap.parse_args()

    info = bm.flagship_info(tempfile.mkdtemp(prefix="flagship_data_"))
    covmat, covmat_params = bm.proposal_covmat()
    info["sampler"] = {"mcmc": {
        "seed": 1,
        "n_chains": ns.n_chains,
        "covmat": covmat,
        "covmat_params": covmat_params,
        "max_samples": ns.max_samples,
        "max_wall": ns.max_wall,
    }}
    if ns.output:
        info["output"] = ns.output

    from cobaya_tpu.run import run

    _, sampler = run(info)
    import numpy as np

    sample = sampler.products()["sample"]
    w = sample.weights
    print("\nposterior means vs truth (LCDM block):")
    for p in bm.COSMO_PARAMS:
        mu = np.average(sample[p], weights=w)
        sd = np.sqrt(np.average((sample[p] - mu) ** 2, weights=w))
        print(f"  {p:8s} {mu:10.5g} +- {sd:.3g}   truth {bm.TRUTH[p]:.5g}")


if __name__ == "__main__":
    main()
