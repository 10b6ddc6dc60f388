"""Grid creation and execution."""

from __future__ import annotations

import argparse
import os
from typing import Mapping, Optional

from ..models.input_ import load_input_dict
from ..utils.log import LoggedError, get_logger, logger_setup
from ..utils.tools import recursive_update
from ..utils.yamlio import yaml_dump_file, yaml_load_file

log = get_logger("grid")


def _load_settings(settings) -> dict:
    if isinstance(settings, Mapping):
        return dict(settings)
    if isinstance(settings, str):
        if settings.endswith(".py"):
            namespace: dict = {}
            with open(settings, encoding="utf-8") as f:
                exec(compile(f.read(), settings, "exec"), namespace)  # noqa: S102
            return {
                k: v for k, v in namespace.items() if not k.startswith("_")
            }
        return yaml_load_file(settings)
    raise LoggedError(log, "Settings must be a dict or a .py/.yaml file.")


def create_grid(grid_dir: str, settings) -> list[str]:
    """Create the grid directory: one input yaml per model x dataset.

    Settings keys (reference gridconfig.py:211-351 capability):

    - ``models`` (name -> info fragment), ``datasets`` (name -> info
      fragment), ``defaults`` (common info), ``skip`` (entry names to
      omit);
    - ``minimize_defaults``: when set (even ``{}``), every entry also gets
      a ``<name>.minimize.yaml`` job replacing the sampler with
      ``minimize`` (merged with the given defaults), to be run after the
      parent chain (``grid-run --minimize``);
    - ``importance_runs``: {tag: post-block fragment} — per entry a
      ``<name>.post.<tag>.yaml`` importance-reweighting job over the
      parent chain (merged over ``importance_defaults``), run with
      ``grid-run --importance``; each also gets a
      ``<name>.post.<tag>.minimize.yaml`` when ``minimize_defaults`` is
      set (``grid-run --importance-minimize``);
    - ``cov_dir``: covmat library folder(s) — entries whose mcmc sampler
      block has ``covmat: auto`` get the ranked best match resolved at
      creation time (autoselect_covmat.get_best_covmat_ext).
    """
    settings = _load_settings(settings)
    models = settings.get("models") or {"": {}}
    datasets = settings.get("datasets") or {"": {}}
    defaults = settings.get("defaults") or {}
    skip = set(settings.get("skip") or ())
    minimize_defaults = settings.get("minimize_defaults")
    importance_runs = settings.get("importance_runs") or {}
    importance_defaults = settings.get("importance_defaults") or {}
    cov_dir = settings.get("cov_dir")
    os.makedirs(os.path.join(grid_dir, "input_files"), exist_ok=True)
    yaml_dump_file(
        os.path.join(grid_dir, "grid_settings.yaml"),
        {"models": list(models), "datasets": list(datasets),
         "importance_runs": list(importance_runs),
         "minimize": minimize_defaults is not None},
    )
    created = []

    def dump(name, info):
        path = os.path.join(grid_dir, "input_files", name + ".yaml")
        yaml_dump_file(path, info, error_if_exists=False)
        created.append(path)
        return path

    for m_name, m_info in models.items():
        for d_name, d_info in datasets.items():
            name = "_".join(x for x in (m_name, d_name) if x)
            if name in skip:
                continue
            info = recursive_update(
                recursive_update(dict(defaults), m_info or {}),
                d_info or {},
            )
            info["output"] = os.path.join(grid_dir, name, name)
            _resolve_auto_covmat(info, cov_dir, name)
            dump(name, info)
            if minimize_defaults is not None:
                info_min = dict(info)
                info_min["sampler"] = {
                    "minimize": dict(minimize_defaults or {})
                }
                dump(name + ".minimize", info_min)
            for tag, post_frag in importance_runs.items():
                post = recursive_update(dict(importance_defaults),
                                        post_frag or {})
                post["suffix"] = tag
                info_post = {"output": info["output"], "post": post,
                             "force": True}
                dump(f"{name}.post.{tag}", info_post)
                if minimize_defaults is not None:
                    info_pm = dict(info)
                    info_pm["sampler"] = {
                        "minimize": dict(minimize_defaults or {})
                    }
                    # minimize over the importance-updated pipeline: start
                    # from the post output chain
                    info_pm["output"] = f"{info['output']}.post.{tag}"
                    info_pm = recursive_update(info_pm, post.get("add") or
                                               {})
                    for name_r in (post.get("remove") or {}).get(
                            "likelihood", []):
                        info_pm.get("likelihood", {}).pop(name_r, None)
                    dump(f"{name}.post.{tag}.minimize", info_pm)
    log.info("Created grid with %d jobs under '%s'.", len(created),
             grid_dir)
    return created


def _resolve_auto_covmat(info, cov_dir, name):
    """Replace mcmc 'covmat: auto' with the library's ranked best match."""
    sampler_block = info.get("sampler") or {}
    mcmc = sampler_block.get("mcmc")
    if not cov_dir or not isinstance(mcmc, Mapping) or \
            mcmc.get("covmat") != "auto":
        return
    from ..cosmo_input.autoselect_covmat import get_best_covmat_ext
    from ..utils.tools import str_to_list

    params_info = {
        p: v for p, v in (info.get("params") or {}).items()
        if isinstance(v, Mapping) and "prior" in v
    }
    best = get_best_covmat_ext(str_to_list(cov_dir), params_info,
                               info.get("likelihood") or {})
    mcmc = dict(mcmc)
    mcmc["covmat"] = (os.path.join(best["folder"], best["name"])
                      if best else None)
    info["sampler"] = dict(sampler_block, mcmc=mcmc)
    log.info("Grid entry '%s': auto covmat -> %s", name,
             mcmc["covmat"])


def grid_inputs(grid_dir: str, kind: str = "chains") -> list[str]:
    """Job input files of one kind: chains (parents), minimize,
    importance, or importance_minimize."""
    folder = os.path.join(grid_dir, "input_files")
    out = []
    for f in sorted(os.listdir(folder)):
        if not f.endswith(".yaml"):
            continue
        stem = f[:-5]
        is_min = stem.endswith(".minimize")
        is_post = ".post." in stem
        job_kind = ("importance_minimize" if is_post and is_min else
                    "importance" if is_post else
                    "minimize" if is_min else "chains")
        if job_kind == kind:
            out.append(os.path.join(folder, f))
    return out


def run_grid(grid_dir: str, dry_run: bool = False,
             job_template: Optional[str] = None,
             resume: bool = True, kind: str = "chains") -> list:
    """Run every grid job of ``kind`` (sequentially), or emit submission
    commands.

    Derived jobs run after their parents: chains first, then
    ``--importance`` (post-processing over the stored chains) and
    ``--minimize``; ``--importance-minimize`` last (reference ordering,
    gridconfig.py:345-350).

    ``job_template``: a string with ``{input}`` and ``{name}`` placeholders;
    when given, the filled commands are printed/returned instead of running
    in-process (plug into sbatch & co.).
    """
    results = []
    for path in grid_inputs(grid_dir, kind=kind):
        name = os.path.splitext(os.path.basename(path))[0]
        if job_template:
            cmd = job_template.format(input=path, name=name)
            print(cmd)
            results.append(cmd)
            continue
        if dry_run:
            results.append(path)
            continue
        from ..run import run

        log.info("Running grid job '%s'...", name)
        try:
            if kind in ("minimize", "importance_minimize"):
                # minimize jobs reuse the parent run's products (MAP start
                # from its chains) instead of resuming/overwriting them
                results.append(run(path, minimize=True))
            else:
                results.append(run(path, resume=resume))
        except Exception as exc:
            log.error("Grid job '%s' failed: %s", name, exc)
            results.append(exc)
    return results


def grid_status(grid_dir: str) -> dict[str, str]:
    """Status per grid job (all kinds): not started / in progress / done."""
    from ..utils import conventions as cv

    status = {}
    for kind in ("chains", "minimize", "importance",
                 "importance_minimize"):
        for path in grid_inputs(grid_dir, kind=kind):
            name = os.path.splitext(os.path.basename(path))[0]
            info = load_input_dict(path)
            prefix = info.get("output")
            if kind in ("minimize", "importance_minimize"):
                done = prefix and os.path.exists(prefix + ".minimum.txt")
                status[name] = "done" if done else "not started"
                continue
            if kind == "importance":
                suffix = (info.get("post") or {}).get("suffix", "")
                done = prefix and os.path.exists(
                    f"{prefix}.post.{suffix}.1.txt")
                status[name] = "done" if done else "not started"
                continue
            checkpoint = None
            if prefix:
                folder = os.path.dirname(prefix)
                if os.path.isdir(folder):
                    for f in os.listdir(folder):
                        if f.endswith(cv.Extension.checkpoint):
                            checkpoint = os.path.join(folder, f)
            if checkpoint is None:
                status[name] = "not started"
            else:
                data = yaml_load_file(checkpoint)
                converged = False
                for block in (data.get("sampler") or {}).values():
                    converged = bool(block.get("converged"))
                status[name] = "done" if converged else "in progress"
    return status


def grid_create_script(args=None):
    logger_setup()
    parser = argparse.ArgumentParser(prog="cobaya-tpu grid-create")
    parser.add_argument("grid_dir")
    parser.add_argument("settings")
    ns = parser.parse_args(args)
    create_grid(ns.grid_dir, ns.settings)


def grid_run_script(args=None):
    logger_setup()
    parser = argparse.ArgumentParser(prog="cobaya-tpu grid-run")
    parser.add_argument("grid_dir")
    parser.add_argument("--dry-run", action="store_true")
    parser.add_argument("--job-template", default=None)
    group = parser.add_mutually_exclusive_group()
    group.add_argument("--minimize", action="store_true",
                       help="run the per-entry minimize jobs")
    group.add_argument("--importance", action="store_true",
                       help="run the importance-sampling (post) jobs")
    group.add_argument("--importance-minimize", action="store_true",
                       help="run minimize jobs over the post outputs")
    ns = parser.parse_args(args)
    kind = ("minimize" if ns.minimize else
            "importance" if ns.importance else
            "importance_minimize" if ns.importance_minimize else "chains")
    run_grid(ns.grid_dir, dry_run=ns.dry_run, job_template=ns.job_template,
             kind=kind)
