"""Multi-process runs over jax.distributed (the reference's MPI mode).

Two localhost CPU processes coordinate through the JAX coordination
service: pooled cross-process R-1 drives a synchronized stop (the
reference's ``test_mcmc_sync``, /root/reference/tests/test_mcmc.py:174-215),
the root process owns shared output products while every rank writes its
own chains, and one process's failure aborts its peers (ProcessState).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch(script: str, rank: int, port: int, extra_env=None):
    env = dict(os.environ)
    env.update({
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "COBAYA_TPU_COORDINATOR": f"127.0.0.1:{port}",
        "COBAYA_TPU_N_PROCESSES": "2",
        "COBAYA_TPU_PROCESS_ID": str(rank),
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
    })
    env.update(extra_env or {})
    return subprocess.Popen(
        [sys.executable, "-c", script],
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


RUN_SCRIPT = r"""
import os, sys
from cobaya_tpu.run import run

prefix = os.environ["TEST_PREFIX"]
info = {
    "params": {
        "x0": {"prior": [-5, 5], "ref": 0.0, "proposal": 0.5},
        "x1": {"prior": [-5, 5], "ref": 0.0, "proposal": 0.5},
    },
    "likelihood": {"gaussian_mixture": {
        "means": [[0.1, -0.2]], "covs": [[[0.6, 0.1], [0.1, 0.4]]],
        "input_params_prefix": "x",
    }},
    "sampler": {os.environ.get("TEST_SAMPLER", "mcmc"): {
        "seed": 7, "n_chains": 16, "max_samples": 3000,
        "learn_every": 250, "Rminus1_stop": 0.05, "burn_in": 0,
        "measure_speeds": False, "output_chains": 1, "fetch_chains": 8,
    }},
    "output": prefix,
    "force": True,
}
upd, sampler = run(info)
print("RESULT", sampler.n_steps, int(sampler.converged),
      round(float(sampler.Rminus1_last), 8))
"""



@pytest.mark.parametrize("kernel", ["mcmc", "hmc"])
def test_two_process_mcmc_sync(tmp_path, kernel):
    port = _free_port()
    prefix = str(tmp_path / "chains" / "mp")
    procs = [
        _launch(RUN_SCRIPT, rank, port,
                {"TEST_PREFIX": prefix, "TEST_SAMPLER": kernel})
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out[-4000:]
    results = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][-1]
        _, n_steps, conv, r1 = line.split()
        results.append((int(n_steps), int(conv), float(r1)))
    # synchronized stop: identical step counts, convergence flag and
    # (pooled) R-1 on both ranks
    assert results[0] == results[1], results
    assert results[0][1] == 1, f"did not converge: {results}"
    # root owns shared products; each rank wrote its own chain
    folder = str(tmp_path / "chains")
    files = sorted(os.listdir(folder))
    assert any(f.endswith("mp.1.txt") for f in files), files
    assert any(f.endswith("mp.2.txt") for f in files), files
    assert any(f.endswith(".checkpoint") for f in files), files
    assert any(f.endswith("mp.updated.yaml") for f in files), files
    # rank chains hold different samples (different RNG streams) but the
    # same total recorded weight (same synced number of steps; row counts
    # differ through run-length encoding of rejections)
    a = np.loadtxt(os.path.join(folder, [f for f in files
                                         if f.endswith("mp.1.txt")][0]))
    b = np.loadtxt(os.path.join(folder, [f for f in files
                                         if f.endswith("mp.2.txt")][0]))
    assert np.isclose(a[:, 0].sum(), b[:, 0].sum())
    assert a[: min(len(a), len(b)), 2].std() > 0
    assert not np.array_equal(a[: min(len(a), len(b)), 2],
                              b[: min(len(a), len(b)), 2])


ERROR_SCRIPT = r"""
import os, sys, time
from cobaya_tpu.parallel import state as pstate

pstate.maybe_init_distributed()
assert pstate.process_count() == 2, pstate.process_count()
rank = pstate.process_index()
try:
    with pstate.ProcessState("errtest", error_timeout=30.0):
        if rank == 1:
            time.sleep(0.5)
            raise RuntimeError("boom on rank 1")
        state = pstate.get_current_state()
        deadline = time.time() + 60
        while time.time() < deadline:
            state.check_error()   # peers poll during long loops
            time.sleep(0.1)
        print("TIMEOUT-NO-ERROR")
        sys.exit(3)
except pstate.OtherProcessError:
    print("GOT-PEER-ERROR")
    sys.exit(0)
except RuntimeError:
    print("RAISED-LOCALLY")
    sys.exit(7)
"""



def test_error_propagates_across_processes():
    port = _free_port()
    procs = [_launch(ERROR_SCRIPT, rank, port) for rank in range(2)]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    # rank 1 raised locally; rank 0 saw the peer error and aborted
    assert procs[1].returncode == 7, outs[1][-2000:]
    assert "RAISED-LOCALLY" in outs[1]
    assert procs[0].returncode == 0, outs[0][-2000:]
    assert "GOT-PEER-ERROR" in outs[0]


MINIMIZE_SCRIPT = r"""
import os
import numpy as np
from cobaya_tpu.run import run

info = {
    "params": {
        "x0": {"prior": [-5, 5], "ref": 2.0, "proposal": 0.5},
        "x1": {"prior": [-5, 5], "ref": -2.0, "proposal": 0.5},
    },
    "likelihood": {"gaussian_mixture": {
        "means": [[0.1, -0.2]], "covs": [[[0.6, 0.1], [0.1, 0.4]]],
        "input_params_prefix": "x",
    }},
    "sampler": {"minimize": {"seed": int(os.environ["COBAYA_TPU_PROCESS_ID"]),
                              "best_of": 2}},
}
upd, sampler = run(info)
r = sampler.result
print("RESULT", round(float(r["fun"]), 8), len(r["all_f"]),
      round(float(np.asarray(r["x"])[0]), 6))
"""


def test_two_process_minimize_pools_best():
    """Both ranks gather all 2x2 starts and agree on the global best
    (reference minimize.py:371-430)."""
    port = _free_port()
    procs = [_launch(MINIMIZE_SCRIPT, rank, port) for rank in (0, 1)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    results = [next(ln for ln in out.splitlines() if ln.startswith("RESULT"))
               for out in outs]
    # identical pooled best on both ranks, over 4 total starts
    assert results[0] == results[1], results
    assert results[0].split()[2] == "4"


NESTED_SCRIPT = r"""
import os
import numpy as np
from cobaya_tpu.run import run

prefix = os.environ["TEST_PREFIX"]
info = {
    "params": {
        "x0": {"prior": [-1, 1], "ref": 0.0, "proposal": 0.05},
        "x1": {"prior": [-1, 1], "ref": 0.0, "proposal": 0.05},
    },
    "likelihood": {"gaussian_mixture": {
        "means": [[0.1, -0.2]], "covs": [[[0.0016, 0.0], [0.0, 0.0009]]],
        "input_params_prefix": "x",
    }},
    "sampler": {"nested": {"seed": 5, "nlive": 200,
                            "precision_criterion": 1e-3}},
    "output": prefix, "force": True,
}
upd, sampler = run(info)
s = sampler.products()["sample"]
print("RESULT", round(sampler.logZ, 6), round(sampler.logZstd, 6),
      sampler._nlive, len(s), round(float(s.mean()[0]), 4))
"""


def test_two_process_nested_merges_runs(tmp_path):
    """Nested sampling over 2 processes: each runs nlive/2 live points,
    the merged run matches the analytic evidence, both ranks agree, and
    only root writes products."""
    port = _free_port()
    prefix = str(tmp_path / "chains" / "ns")
    procs = [_launch(NESTED_SCRIPT, rank, port,
                     extra_env={"TEST_PREFIX": prefix}) for rank in (0, 1)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    results = [next(ln for ln in out.splitlines() if ln.startswith("RESULT"))
               for out in outs]
    # identical merged evidence/sample on both ranks
    assert results[0] == results[1], results
    _, logZ, logZstd, nlive_rank, n_samples, mean0 = results[0].split()
    # each rank ran half the live points
    assert int(nlive_rank) == 100
    # analytic: gaussian inside [-1,1]^2 box -> logZ = -log 4
    logZ, logZstd = float(logZ), float(logZstd)
    assert abs(logZ - (-np.log(4.0))) < 3 * logZstd + 0.1, (logZ, logZstd)
    assert abs(float(mean0) - 0.1) < 0.02
    folder = str(tmp_path / "chains")
    files = sorted(os.listdir(folder))
    # root-only products: one merged chain, one evidence file
    assert [f for f in files if f.endswith(".txt")] == ["ns.1.txt"], files
    assert any(f.endswith(".logZ") for f in files), files


POST_SCRIPT = r"""
import os
import numpy as np
from cobaya_tpu.run import run
from cobaya_tpu.post import post
from cobaya_tpu.parallel import state as pstate

prefix = os.environ["TEST_PREFIX"]
base = {
    "params": {
        "x0": {"prior": [-5, 5], "ref": 0.0, "proposal": 0.5},
        "x1": {"prior": [-5, 5], "ref": 0.0, "proposal": 0.5},
    },
    "likelihood": {"gaussian_mixture": {
        "means": [[0.1, -0.2]], "covs": [[[0.6, 0.1], [0.1, 0.4]]],
        "input_params_prefix": "x",
    }},
    "sampler": {"mcmc": {"seed": 3, "n_chains": 8, "max_samples": 600,
                          "learn_every": 200, "measure_speeds": False,
                          "output_chains": 1, "fetch_chains": 8}},
    "output": prefix, "force": True,
}
run(base)
pstate.barrier(tag="chains-done")
info = {
    "output": prefix,
    "post": {"suffix": "p", "add": {
        "prior": {"cut": "lambda x0: 0.0 if x0 < 1 else -np.inf"}}},
}
upd, res = post(info)
print("RESULT", round(res.stats["eff_samples"], 4),
      int(res.sample is not None))
# a second post() in the same session must not collide on KV keys
info2 = {"output": prefix, "post": {"suffix": "q", "add": {
    "params": {"s": {"derived": "lambda x0, x1: x0 + x1"}}}}}
upd2, res2 = post(info2)
print("RESULT2", round(res2.stats["eff_samples"], 4))
# a run() AFTER a root-gated post() still works: root's recursion must not
# have advanced collective counters its peers never saw
base2 = dict(base, output=prefix + "-second")
base2["sampler"] = {"mcmc": dict(base["sampler"]["mcmc"], max_samples=200)}
upd3, s3 = run(base2)
print("RESULT3", s3.n_steps)
"""


def test_two_process_post_root_gated(tmp_path):
    """post() in a 2-process run: root computes + writes, the peer gets the
    broadcast stats; no duplicate product writes."""
    import glob

    port = _free_port()
    prefix = str(tmp_path / "chains" / "pp")
    procs = [_launch(POST_SCRIPT, rank, port,
                     extra_env={"TEST_PREFIX": prefix}) for rank in (0, 1)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    results = sorted(
        next(ln for ln in out.splitlines() if ln.startswith("RESULT"))
        for out in outs
    )
    # same pooled stats everywhere; only root holds the sample object
    assert results[0].split()[1] == results[1].split()[1]
    assert {r.split()[2] for r in results} == {"0", "1"}
    post_files = glob.glob(prefix + ".post.p.*.txt")
    assert post_files, "root wrote post products"
    # the second post() (repeated KV tags) also agreed across ranks
    results2 = sorted(
        next(ln for ln in out.splitlines() if ln.startswith("RESULT2"))
        for out in outs
    )
    assert results2[0] == results2[1], results2
    assert glob.glob(prefix + ".post.q.*.txt")
    # the follow-up run() completed on both ranks (counter stayed in sync)
    for out in outs:
        assert any(ln.startswith("RESULT3 200") for ln in out.splitlines()), \
            out[-2000:]
