"""Grid maintenance: list, progress, cleanup, copy/extract outputs.

Capability parity with /root/reference/cobaya/grid_tools/gridmanage.py
(grid_list, grid_converge, grid_cleanup, grid_copy, grid_extract) and
delete_jobs.py / running_jobs.py CLI entry points.
"""

from __future__ import annotations

import argparse
import os
import shutil
import zipfile
from typing import Optional

import numpy as np

from ..utils.log import get_logger, logger_setup
from .grid import grid_inputs, grid_status

log = get_logger("gridmanage")

_PRODUCT_EXTS = (".txt", ".progress", ".checkpoint", ".covmat", ".state.npz",
                 ".minimum", ".minimum.txt", ".locked", ".updated.yaml")


def _entries(grid_dir: str) -> dict[str, str]:
    """{name: output prefix} for every grid entry."""
    from ..models.input_ import load_input_dict

    out = {}
    for path in grid_inputs(grid_dir):
        name = os.path.splitext(os.path.basename(path))[0]
        prefix = load_input_dict(path).get("output")
        if prefix:
            out[name] = prefix
    return out


def _product_files(prefix: str) -> list[str]:
    folder, base = os.path.dirname(prefix) or ".", os.path.basename(prefix)
    if not os.path.isdir(folder):
        return []
    return sorted(
        os.path.join(folder, f) for f in os.listdir(folder)
        if f.startswith(base) and f.endswith(_PRODUCT_EXTS)
    )


def grid_list(grid_dir: str) -> dict[str, dict]:
    """Per-entry status, file count and on-disk size."""
    status = grid_status(grid_dir)
    report = {}
    for name, prefix in _entries(grid_dir).items():
        files = _product_files(prefix)
        report[name] = {
            "status": status.get(name, "unknown"),
            "files": len(files),
            "size": sum(os.path.getsize(f) for f in files),
        }
    return report


def grid_progress(grid_dir: str) -> dict[str, Optional[float]]:
    """Last R-1 per entry from the .progress tables (None if absent)."""
    import numpy as np

    out: dict[str, Optional[float]] = {}
    for name, prefix in _entries(grid_dir).items():
        progress = prefix + ".progress"
        out[name] = None
        if os.path.exists(progress):
            try:
                # columns: N timestamp acceptance Rminus1 Rminus1_cl
                rows = np.loadtxt(progress, usecols=(0, 2, 3), ndmin=2)
                if rows.size:
                    out[name] = float(rows[-1, 2])
            except Exception:  # malformed/partial file mid-write
                pass
    return out


def grid_cleanup(grid_dir: str, dry_run: bool = False,
                 keep_converged: bool = True) -> list[str]:
    """Delete chain products (inputs stay); converged runs kept by default."""
    status = grid_status(grid_dir)
    removed = []
    for name, prefix in _entries(grid_dir).items():
        if keep_converged and status.get(name) == "done":
            continue
        for f in _product_files(prefix):
            removed.append(f)
            if not dry_run:
                os.remove(f)
    if not dry_run:
        log.info("Removed %d file(s).", len(removed))
    return removed


def grid_copy(grid_dir: str, target: str, converged_only: bool = False,
              zip_output: bool = False) -> list[str]:
    """Copy grid outputs (optionally into a single zip)."""
    status = grid_status(grid_dir)
    copied = []
    zf = zipfile.ZipFile(target, "w") if zip_output else None
    try:
        for name, prefix in _entries(grid_dir).items():
            if converged_only and status.get(name) != "done":
                continue
            for f in _product_files(prefix):
                rel = os.path.join(name, os.path.basename(f))
                if zf is not None:
                    zf.write(f, rel)
                else:
                    dest = os.path.join(target, rel)
                    os.makedirs(os.path.dirname(dest), exist_ok=True)
                    shutil.copy2(f, dest)
                copied.append(rel)
    finally:
        if zf is not None:
            zf.close()
    return copied


def grid_extract(grid_dir: str, target: str, exts: tuple = (".covmat",),
                 flat: bool = True) -> list[str]:
    """Pull one product type out of every run (e.g. all covmats)."""
    os.makedirs(target, exist_ok=True)
    out = []
    for name, prefix in _entries(grid_dir).items():
        for f in _product_files(prefix):
            if f.endswith(tuple(exts)):
                dest = os.path.join(
                    target,
                    os.path.basename(f) if flat
                    else os.path.join(name, os.path.basename(f)),
                )
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                shutil.copy2(f, dest)
                out.append(dest)
    return out


def grid_getdist(grid_dir: str, burn_remove: float = 0.3,
                 update_only: bool = False,
                 out_dir: Optional[str] = None) -> list[str]:
    """Marginal-statistics analysis of every grid chain.

    Reference: cobaya/grid_tools/gridmanage.py:114 (cobaya-grid-getdist)
    shells out to getdist per chain; here the stats come from the native
    weighted-quantile path (`SampleCollection.get_stats`), with getdist
    used for the output files when it is importable.  Writes
    `<out_dir>/<name>.margestats` (+ `.likestats`) per entry.
    """
    from ..io.output import load_samples

    out_dir = out_dir or os.path.join(grid_dir, "dist")
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for name, prefix in _entries(grid_dir).items():
        marge_path = os.path.join(out_dir, name + ".margestats")
        chain_files = [f for f in _product_files(prefix)
                       if f.endswith(".txt")]
        if not chain_files:
            continue
        if update_only and os.path.exists(marge_path) and (
                os.path.getmtime(marge_path)
                >= max(map(os.path.getmtime, chain_files))):
            continue
        try:
            coll = load_samples(prefix, skip=burn_remove, combined=True)
        except Exception as exc:
            log.warning("Skipping '%s': %s", name, exc)
            continue
        if coll is None or len(coll) == 0:
            continue
        stats = coll.get_stats()
        with open(marge_path, "w", encoding="utf-8") as f:
            f.write(f"Marginalized statistics: {name}\n\n")
            f.write("%-22s %15s %15s %15s %15s %15s %15s\n" % (
                "parameter", "mean", "sddev",
                "lower1", "upper1", "lower2", "upper2"))
            for p, entry in stats.items():
                lo1, hi1 = entry.get("cl68", (np.nan, np.nan))
                lo2, hi2 = entry.get("cl95", (np.nan, np.nan))
                f.write("%-22s %15.7E %15.7E %15.7E %15.7E %15.7E %15.7E\n"
                        % (p, entry["mean"], entry["std"],
                           lo1, hi1, lo2, hi2))
        best = dict(zip(coll.columns, coll.MAP()))
        like_path = os.path.join(out_dir, name + ".likestats")
        with open(like_path, "w", encoding="utf-8") as f:
            f.write(f"Best fit sample: {name}\n")
            f.write("-log(Posterior) = %.6f\n\n"
                    % best.get("minuslogpost", np.nan))
            for p, v in best.items():
                f.write("%-22s %15.7E\n" % (p, v))
        written += [marge_path, like_path]
        log.info("Analyzed '%s' -> %s", name, marge_path)
    return written


# ---- CLI entry points -------------------------------------------------------

def grid_getdist_script(args=None):
    logger_setup()
    parser = argparse.ArgumentParser(prog="cobaya-tpu grid-getdist")
    parser.add_argument("grid_dir")
    parser.add_argument("--burn_remove", type=float, default=0.3)
    parser.add_argument("--update_only", action="store_true")
    parser.add_argument("--out", default=None)
    ns = parser.parse_args(args)
    for path in grid_getdist(ns.grid_dir, burn_remove=ns.burn_remove,
                             update_only=ns.update_only, out_dir=ns.out):
        print("wrote " + path)


def grid_list_script(args=None):
    logger_setup()
    from .batch import BatchFilter, load_jobs

    parser = argparse.ArgumentParser(prog="cobaya-tpu grid-list")
    parser.add_argument("grid_dir")
    BatchFilter.add_arguments(parser, converge=True, notexist=True)
    ns = parser.parse_args(args)
    jobs = BatchFilter.select(load_jobs(ns.grid_dir), ns,
                              grid_dir=ns.grid_dir)
    wanted = {j.name for j in jobs} | {j.name.split(".")[0] for j in jobs}
    for name, rec in grid_list(ns.grid_dir).items():
        if name not in wanted:
            continue
        print(f"{name}: {rec['status']}  "
              f"({rec['files']} files, {rec['size'] / 1e6:.1f} MB)")


def grid_cleanup_script(args=None):
    logger_setup()
    parser = argparse.ArgumentParser(prog="cobaya-tpu grid-cleanup")
    parser.add_argument("grid_dir")
    parser.add_argument("--dry-run", action="store_true")
    parser.add_argument("--all", action="store_true",
                        help="also remove converged runs")
    ns = parser.parse_args(args)
    removed = grid_cleanup(ns.grid_dir, dry_run=ns.dry_run,
                           keep_converged=not ns.all)
    for f in removed:
        print(("[dry-run] " if ns.dry_run else "removed ") + f)


def grid_copy_script(args=None):
    logger_setup()
    parser = argparse.ArgumentParser(prog="cobaya-tpu grid-copy")
    parser.add_argument("grid_dir")
    parser.add_argument("target")
    parser.add_argument("--converged-only", action="store_true")
    parser.add_argument("--zip", action="store_true")
    ns = parser.parse_args(args)
    grid_copy(ns.grid_dir, ns.target, converged_only=ns.converged_only,
              zip_output=ns.zip)


def grid_extract_script(args=None):
    logger_setup()
    parser = argparse.ArgumentParser(prog="cobaya-tpu grid-extract")
    parser.add_argument("grid_dir")
    parser.add_argument("target")
    parser.add_argument("--ext", nargs="*", default=[".covmat"])
    ns = parser.parse_args(args)
    grid_extract(ns.grid_dir, ns.target, exts=tuple(ns.ext))


def running_jobs_script(args=None):
    logger_setup()
    parser = argparse.ArgumentParser(prog="cobaya-tpu running-jobs")
    parser.add_argument("batch_path")
    parser.add_argument("--engine", default="slurm")
    ns = parser.parse_args(args)
    from .jobqueue import JobIndex, queue_job_details

    queued = {job_id: state for job_id, _, state
              in queue_job_details(ns.engine)}
    for job_id, rec in JobIndex(ns.batch_path).jobs.items():
        print(f"{job_id} {rec['name']}: {queued.get(job_id, 'not queued')}")


def delete_jobs_script(args=None):
    logger_setup()
    parser = argparse.ArgumentParser(prog="cobaya-tpu delete-jobs")
    parser.add_argument("batch_path")
    parser.add_argument("--name", nargs="*", default=None)
    parser.add_argument("--dry-run", action="store_true")
    ns = parser.parse_args(args)
    from .jobqueue import delete_jobs

    for job_id in delete_jobs(ns.batch_path, names=ns.name,
                              dry_run=ns.dry_run):
        print(("[dry-run] would cancel " if ns.dry_run else "cancelled ")
              + job_id)
