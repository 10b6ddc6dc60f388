"""Grid job manifest and filtering.

The reference tracks grid entries as a pickled ``BatchJob`` object graph
(``/root/reference/cobaya/grid_tools/batchjob.py:232-741``) and filters
them with an argparse layer (``batchjob_args.py:7-280``).  Here the grid
directory instead carries a plain-yaml job manifest (``jobs.yaml``)
written at creation time, and :class:`BatchFilter` provides the same
selection vocabulary (name globs, parameter/data tags, groups,
importance handling, existence and convergence cuts) over it.  The
manifest is human-readable, diff-able and rebuildable from the input
files of a pre-manifest grid.
"""

from __future__ import annotations

import fnmatch
import os
from dataclasses import dataclass, field
from typing import Iterable, Optional

from ..utils.yamlio import yaml_dump_file, yaml_load_file

JOBS_FILE = "jobs.yaml"

KINDS = ("chains", "minimize", "importance", "importance_minimize")


@dataclass
class JobItem:
    """One grid job (a chain run or a derived minimize/importance job).

    Mirrors the introspection surface of the reference JobItem
    (batchjob.py:232-521) over our on-disk layout.
    """

    name: str
    kind: str = "chains"
    group: str = ""
    base: str = ""
    param_tags: list = field(default_factory=list)
    data_tags: list = field(default_factory=list)
    importance_tag: str = ""
    parent: str = ""  # name of the parent chain job for derived jobs
    input_file: str = ""  # relative to the grid dir
    output_prefix: str = ""  # relative to the grid dir

    # -- tag views (reference naming: paramtag = base_p1_p2) -----------
    @property
    def paramtag(self) -> str:
        return "_".join(x for x in [self.base, *self.param_tags] if x)

    @property
    def datatag(self) -> str:
        return "_".join(self.data_tags)

    @property
    def is_importance(self) -> bool:
        return self.kind in ("importance", "importance_minimize")

    def has_param(self, names) -> bool:
        names = [names] if isinstance(names, str) else names
        return any(p in self.param_tags for p in names)

    def has_all_params(self, names) -> bool:
        names = [names] if isinstance(names, str) else names
        return all(p in self.param_tags for p in names)

    def has_data(self, names) -> bool:
        names = [names] if isinstance(names, str) else names
        return any(d in self.data_tags for d in names)

    def has_all_data(self, names) -> bool:
        names = [names] if isinstance(names, str) else names
        return all(d in self.data_tags for d in names)

    # -- on-disk state (reference batchjob.py:383,440,456,468) ---------
    def chain_root(self, grid_dir: str) -> str:
        return os.path.join(grid_dir, self.output_prefix)

    def chain_exists(self, grid_dir: str) -> bool:
        root = self.chain_root(grid_dir)
        if self.kind in ("minimize", "importance_minimize"):
            return os.path.exists(root + ".minimum.txt")
        if self.kind == "importance":
            return os.path.exists(root + ".1.txt")
        return os.path.exists(root + ".1.txt") or os.path.exists(
            root + ".txt")

    def checkpoint_file(self, grid_dir: str) -> Optional[str]:
        """The run's ``<root>.<sampler>.checkpoint`` file, if any."""
        from ..utils import conventions as cv

        root = self.chain_root(grid_dir)
        folder, base = os.path.dirname(root), os.path.basename(root)
        if not os.path.isdir(folder):
            return None
        for f in sorted(os.listdir(folder)):
            if f.startswith(base + ".") and \
                    f.endswith(cv.Extension.checkpoint):
                return os.path.join(folder, f)
        return None

    def converge_stat(self, grid_dir: str) -> Optional[float]:
        """Last R-1 of the run (from the checkpoint), or None."""
        ckpt = self.checkpoint_file(grid_dir)
        if ckpt is None:
            return None
        data = yaml_load_file(ckpt)
        for block in (data.get("sampler") or {}).values():
            r = block.get("Rminus1_last")
            if r is not None:
                return float(r)
        return None

    def chain_finished(self, grid_dir: str) -> bool:
        if self.kind in ("minimize", "importance_minimize", "importance"):
            return self.chain_exists(grid_dir)
        ckpt = self.checkpoint_file(grid_dir)
        if ckpt is None:
            return False
        data = yaml_load_file(ckpt)
        return any(bool(block.get("converged"))
                   for block in (data.get("sampler") or {}).values())

    def converge_better_than(self, grid_dir: str, r: float) -> bool:
        stat = self.converge_stat(grid_dir)
        return stat is not None and stat <= r


def save_jobs(grid_dir: str, jobs: Iterable[JobItem]) -> str:
    path = os.path.join(grid_dir, JOBS_FILE)
    yaml_dump_file(path, {"jobs": [vars(j) for j in jobs]},
                   error_if_exists=False)
    return path


def load_jobs(grid_dir: str) -> list[JobItem]:
    """Jobs of a grid: from the manifest, else rebuilt from input files."""
    path = os.path.join(grid_dir, JOBS_FILE)
    if os.path.exists(path):
        return [JobItem(**j) for j in yaml_load_file(path)["jobs"]]
    return rebuild_jobs(grid_dir)


def rebuild_jobs(grid_dir: str) -> list[JobItem]:
    """Reconstruct a manifest for a grid created before manifests existed
    (name/kind/tags from filenames; no group/base information)."""
    folder = os.path.join(grid_dir, "input_files")
    if not os.path.isdir(folder):
        return []
    jobs = []
    for f in sorted(os.listdir(folder)):
        if not f.endswith(".yaml"):
            continue
        stem = f[:-5]
        is_min = stem.endswith(".minimize")
        core = stem[:-len(".minimize")] if is_min else stem
        tag = ""
        if ".post." in core:
            parent, tag = core.split(".post.", 1)
            kind = "importance_minimize" if is_min else "importance"
        else:
            parent = "" if not is_min else core
            kind = "minimize" if is_min else "chains"
        chain = core.split(".post.", 1)[0]
        info = yaml_load_file(os.path.join(folder, f))
        prefix = info.get("output") or os.path.join(chain, chain)
        if kind == "importance":
            prefix = f"{prefix}.post.{tag}"
        jobs.append(JobItem(
            name=stem, kind=kind, parent=parent or (chain if kind != "chains"
                                                    else ""),
            param_tags=chain.split("_"), data_tags=chain.split("_"),
            importance_tag=tag,
            input_file=os.path.join("input_files", f),
            output_prefix=os.path.relpath(prefix, grid_dir)
            if os.path.isabs(prefix) else prefix,
        ))
    return jobs


class BatchFilter:
    """Reference ``BatchArgs`` selection vocabulary over a job manifest.

    Attach the options to any grid CLI with :meth:`add_arguments`, then
    call :meth:`select` with the parsed namespace.  Matching semantics
    follow ``/root/reference/cobaya/grid_tools/batchjob_args.py:190-270``:
    ``--name`` takes fnmatch globs over full job names; ``--param`` /
    ``--data`` match any listed tag (``--paramtag``/``--datatag`` the
    joined tags exactly); musthave/skip variants restrict further;
    importance jobs are included unless ``--noimportance``, and can be
    restricted by ``--importance`` (data names) or ``--importancetag``.
    """

    @staticmethod
    def add_arguments(parser, converge: bool = False,
                      notexist: bool = False) -> None:
        parser.add_argument("--name", nargs="+", default=None,
                            help="job name globs (base_p1_data1 style)")
        parser.add_argument("--param", nargs="+", default=None,
                            help="only runs varying any of these params")
        parser.add_argument("--paramtag", nargs="+", default=None,
                            help="only runs with this exact parameter tag")
        parser.add_argument("--data", nargs="+", default=None,
                            help="only runs including any of these data")
        parser.add_argument("--datatag", nargs="+", default=None,
                            help="only runs with this exact data tag")
        parser.add_argument("--musthave-data", nargs="+", default=None,
                            help="only runs including ALL of these data")
        parser.add_argument("--musthave-param", nargs="+", default=None,
                            help="only runs varying ALL of these params")
        parser.add_argument("--skip-data", nargs="+", default=None,
                            help="skip runs including any of these data")
        parser.add_argument("--skip-param", nargs="+", default=None,
                            help="skip runs varying any of these params")
        parser.add_argument("--group", nargs="+", default=None,
                            help="only these group names")
        parser.add_argument("--skip-group", nargs="+", default=None,
                            help="exclude these group names")
        parser.add_argument("--noimportance", action="store_true",
                            help="original chains only")
        parser.add_argument("--importance", nargs="*", default=None,
                            help="data names of importance runs to include")
        parser.add_argument("--importancetag", nargs="*", default=None,
                            help="importance tags to include")
        if converge:
            parser.add_argument("--converge", type=float, default=0,
                                help="minimum R-1 convergence")
        if notexist:
            parser.add_argument("--notexist", action="store_true",
                                help="only jobs with no chains on disk yet")

    @staticmethod
    def select(jobs: Iterable[JobItem], ns, grid_dir: str = "",
               kinds: Optional[tuple] = None) -> list[JobItem]:
        out = []
        for job in jobs:
            if kinds is not None and job.kind not in kinds:
                continue
            if not BatchFilter._wanted(job, ns):
                continue
            if getattr(ns, "notexist", False) and \
                    job.chain_exists(grid_dir):
                continue
            if getattr(ns, "converge", 0):
                if not job.converge_better_than(grid_dir, ns.converge):
                    continue
            out.append(job)
        return out

    @staticmethod
    def _wanted(job: JobItem, ns) -> bool:
        if job.is_importance:
            if getattr(ns, "noimportance", False):
                return False
            tags = getattr(ns, "importancetag", None)
            if tags:
                if job.importance_tag not in tags:
                    return False
            names = getattr(ns, "importance", None)
            if names:
                # the importance tag is built from the added data names
                if not any(x in job.importance_tag.split("_")
                           for x in names):
                    return False
        elif getattr(ns, "importance", None) is not None and \
                not getattr(ns, "importancetag", None):
            # --importance given: importance jobs only (reference
            # jobItemWanted semantics)
            return False
        if ns.name is not None and not any(
                fnmatch.fnmatch(job.name, pat) for pat in ns.name):
            return False
        if ns.group is not None and job.group not in ns.group:
            return False
        if ns.skip_group is not None and job.group in ns.skip_group:
            return False
        if ns.musthave_param is not None and \
                not job.has_all_params(ns.musthave_param):
            return False
        if ns.paramtag is not None:
            if job.paramtag not in ns.paramtag:
                return False
        else:
            if ns.param is not None and not job.has_param(ns.param):
                return False
            if ns.skip_param is not None and job.has_param(ns.skip_param):
                return False
        if ns.musthave_data is not None and \
                not job.has_all_data(ns.musthave_data):
            return False
        if ns.datatag is not None:
            if job.datatag not in ns.datatag:
                return False
        else:
            if ns.data is not None and not job.has_data(ns.data):
                return False
            if ns.skip_data is not None and job.has_data(ns.skip_data):
                return False
        return True
