"""MXU-batching experiment for the flagship likelihood ell contractions.

Round-2..4 open question (docs/performance.md): would walker-batching the
613-bin plik-lite / CamSpec foreground ell matmuls onto the MXU lift the
flagship posterior throughput?  This script measures, on the real device:

1. full flagship posterior, vmapped over C walkers, at the production
   matmul precision ("highest", the bf16-corruption fix of round 4) —
   wall per eval + analytic TFLOP/s from the XLA cost model;
2. the same program at "default" matmul precision (single bf16 pass —
   accuracy-unsafe for the posterior, measured only to bound the MXU
   speedup available to the contractions);
3. the isolated plik-lite binning contraction in two shapes:
   a. exactly as the likelihood computes it under vmap
      (vmap over walkers of (B, L) @ (L,) matvecs — XLA batches this to
      one (C, L) x (L, B) matmul already), and
   b. a hand-padded variant with both dimensions rounded up to MXU tiles
      (128 lanes) in bf16 — the best case the hardware offers.

Usage:  python scripts/mxu_experiment.py [--n-chains 8192] [--iters 20]
Writes one JSON line; numbers go into docs/performance.md.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))


def flops_of(compiled) -> float:
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def time_it(fn, arg, iters=20):
    """Chained timing: each call's input depends on the previous call's
    output, and the loop ends with a scalar device fetch.  Plain
    ``block_until_ready`` returns early on this relay backend (measured:
    impossible >1.5 PFLOP/s), so wall time must be anchored by a real
    data round trip."""
    import jax
    import jax.numpy as jnp

    out = fn(arg)
    jax.block_until_ready(out)  # compile + warm
    float(np.asarray(jax.device_get(out.ravel()[0])))
    t0 = time.perf_counter()
    prev = out
    for _ in range(iters):
        bump = (prev.ravel()[0] * 0).astype(arg.dtype)
        out = fn(arg + bump)
        prev = out
    float(np.asarray(jax.device_get(prev.ravel()[0])))
    return (time.perf_counter() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-chains", type=int, default=8192)
    parser.add_argument("--iters", type=int, default=20)
    ns = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from cobaya_tpu.models.model import get_model
    from cobaya_tpu.ops import hoist as hoist_ops
    from cobaya_tpu.theories.emulator import benchmodel as bm

    C = ns.n_chains
    info = bm.flagship_info("/tmp/cobaya_tpu_bench_data")
    results = {"n_chains": C, "device": str(jax.devices()[0])}

    d = len(bm.sampled_names())
    rng = np.random.default_rng(0)
    covmat, names = bm.proposal_covmat()
    x0 = np.array([bm.TRUTH[p] for p in names], np.float32)
    xs = jnp.asarray(
        x0 + 0.1 * rng.standard_normal((C, d)) @ np.linalg.cholesky(
            covmat).T.astype(np.float32), jnp.float32)

    for precision in ("highest", "default"):
        model = get_model({k: v for k, v in info.items()
                           if k != "sampler"} | {
                               "matmul_precision": precision})
        logpost = model.make_logposterior_fn()
        consts = hoist_ops.device_consts(
            hoist_ops.collect(logpost, np.zeros(d)))
        fn = hoist_ops.jit_with_consts(
            lambda x: jax.vmap(logpost)(x)[0], consts)
        dt = time_it(fn, xs, iters=ns.iters)
        flops = flops_of(fn.lower(xs).compile())
        results[f"posterior_{precision}"] = {
            "evals_per_s": round(C / dt, 1),
            "wall_us_per_eval": round(1e6 * dt / C, 3),
            "tflops_per_s": round(flops / dt / 1e12, 4),
            "program_gflops": round(flops / 1e9, 3),
        }
        del model, logpost, fn

    # isolated plik-lite contraction: (C, L) theory D_l block x binning
    L, B = 2509, 613
    bin_m = jnp.asarray(rng.standard_normal((B, L)), jnp.float32)
    cls_batch = jnp.asarray(rng.standard_normal((C, L)), jnp.float32)

    @jax.jit
    def contraction_vmap(cls_b):
        # exactly the likelihood's form: per-walker matvec under vmap
        with jax.default_matmul_precision("highest"):
            return jax.vmap(lambda v: bin_m @ v)(cls_b)

    Lp = (L + 127) // 128 * 128
    Bp = (B + 127) // 128 * 128
    bin_pad = jnp.zeros((Bp, Lp), jnp.bfloat16).at[:B, :L].set(
        bin_m.astype(jnp.bfloat16))
    cls_pad = jnp.zeros((C, Lp), jnp.bfloat16).at[:, :L].set(
        cls_batch.astype(jnp.bfloat16))

    @jax.jit
    def contraction_padded_bf16(cls_b):
        return (cls_b @ bin_pad.T)[:, :B]

    for name, fn, arg in (
        ("contraction_vmap_f32_highest", contraction_vmap, cls_batch),
        ("contraction_padded_bf16", contraction_padded_bf16, cls_pad),
    ):
        dt = time_it(fn, arg, iters=ns.iters)
        flops = 2.0 * C * B * L
        results[name] = {
            "wall_us_per_eval": round(1e6 * dt / C, 3),
            "tflops_per_s": round(flops / dt / 1e12, 2),
        }

    print(json.dumps(results))


if __name__ == "__main__":
    main()
