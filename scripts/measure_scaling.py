"""Measure multi-device scaling of the sampling epoch (virtual CPU mesh).

Two measurements per sampler kind (mcmc, hmc), each in a fresh subprocess
with ``--xla_force_host_platform_device_count=N``:

- **weak scaling**: fixed walkers per device, 1/2/4/8 devices — per-epoch
  wall per device.  On real TPU chips this is the production regime (each
  device is its own silicon); on the virtual CPU mesh all "devices" share
  one CPU pool, so the weak curve conflates partitioning overhead with
  genuine oversubscription — read it as an upper bound.
- **sharding overhead**: fixed TOTAL walkers, 1 vs N devices.  Total FLOPs
  are constant on the shared CPU, so any wall increase is the cost of the
  partitioned program (collectives, halo, per-device dispatch) — the
  honest single-host proxy for multi-chip overhead.

Prints one JSON line per configuration and a summary table; the numbers in
docs/distributed.md come from this script.

Run:  python scripts/measure_scaling.py [--devices 1,2,4,8]
      [--walkers-per-device 2048] [--total 8192] [--dim 32] [--epochs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_INNER = r"""
import json, os, sys, time
import numpy as np

sys.path.insert(0, __REPO__)
import jax

cfg = json.loads(__CFG__)
assert len(jax.devices()) == cfg["devices"], (
    len(jax.devices()), cfg["devices"])

from bench import build_info
from cobaya_tpu.models.model import get_model
from cobaya_tpu.samplers.sampler import get_sampler

info, cov = build_info(dim=cfg["dim"], n_chains=cfg["n_chains"])
opts = info["sampler"].pop("mcmc")
opts["learn_every"] = cfg["steps_per_epoch"]
opts["fetch_chains"] = min(8, cfg["n_chains"])
if cfg["kind"] == "hmc":
    opts.pop("oversample_power", None)
    opts.update({"leapfrog_steps": 12, "records_per_epoch": 64})
    info["sampler"] = {"hmc": opts}
else:
    info["sampler"] = {"mcmc": opts}
model = get_model({k: v for k, v in info.items() if k != "sampler"})
sampler = get_sampler(info["sampler"], model)
sampler.warmup()
walls = []
for _ in range(cfg["epochs"]):
    t0 = time.time()
    sampler._run_epoch(cfg["steps_per_epoch"], record=False)
    jax.block_until_ready(sampler._carry.x)
    walls.append(time.time() - t0)
best = min(walls)
print("RESULT " + json.dumps({
    "kind": cfg["kind"], "devices": cfg["devices"],
    "n_chains": cfg["n_chains"], "epoch_wall_s": round(best, 4),
    "walls": [round(w, 4) for w in walls],
    "evals_per_s": round(cfg["n_chains"] * cfg["steps_per_epoch"] / best),
}))
"""


def run_case(kind, devices, n_chains, dim, epochs, steps_per_epoch):
    cfg = json.dumps({"kind": kind, "devices": devices,
                      "n_chains": n_chains, "dim": dim, "epochs": epochs,
                      "steps_per_epoch": steps_per_epoch})
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", ""))
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={devices}"
    ).strip()
    code = _INNER.replace("__REPO__", repr(REPO)).replace(
        "__CFG__", repr(cfg))
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=1800)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"case {kind}/{devices}dev failed:\n{proc.stderr[-3000:]}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--walkers-per-device", type=int, default=2048)
    ap.add_argument("--total", type=int, default=8192,
                    help="total walkers for the fixed-total overhead runs")
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--steps-per-epoch", type=int, default=256)
    ap.add_argument("--kinds", default="mcmc,hmc")
    ns = ap.parse_args()
    devs = [int(d) for d in ns.devices.split(",")]
    rows = []
    for kind in ns.kinds.split(","):
        for d in devs:
            r = run_case(kind, d, ns.walkers_per_device * d, ns.dim,
                         ns.epochs, ns.steps_per_epoch)
            r["mode"] = "weak"
            rows.append(r)
            print(json.dumps(r), flush=True)
        for d in (1, max(devs)):
            r = run_case(kind, d, ns.total, ns.dim, ns.epochs,
                         ns.steps_per_epoch)
            r["mode"] = "fixed-total"
            rows.append(r)
            print(json.dumps(r), flush=True)
    print("\n== weak scaling (fixed walkers/device; shared-CPU upper "
          "bound) ==")
    for kind in ns.kinds.split(","):
        base = next(r for r in rows
                    if r["kind"] == kind and r["mode"] == "weak"
                    and r["devices"] == devs[0])
        for r in rows:
            if r["kind"] == kind and r["mode"] == "weak":
                print(f"  {kind} {r['devices']}dev x "
                      f"{r['n_chains'] // r['devices']}w: "
                      f"epoch {r['epoch_wall_s']:.3f}s "
                      f"({r['epoch_wall_s'] / base['epoch_wall_s']:.2f}x "
                      f"vs 1dev)")
    print("== sharding overhead (fixed total walkers) ==")
    for kind in ns.kinds.split(","):
        sub = [r for r in rows
               if r["kind"] == kind and r["mode"] == "fixed-total"]
        one = next(r for r in sub if r["devices"] == 1)
        many = next(r for r in sub if r["devices"] != 1)
        print(f"  {kind}: {many['devices']}-way sharding = "
              f"{many['epoch_wall_s'] / one['epoch_wall_s']:.2f}x the "
              f"1-device wall at {ns.total} walkers")


if __name__ == "__main__":
    main()
