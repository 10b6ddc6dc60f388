"""Grid creation and execution."""

from __future__ import annotations

import argparse
import os
from typing import Mapping, Optional

from ..models.input_ import load_input_dict
from ..utils.log import LoggedError, get_logger, logger_setup
from ..utils.tools import recursive_update
from ..utils.yamlio import yaml_dump_file, yaml_load_file
from . import batch

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
    - ``groups`` (optional, reference batchjob.py:563-608 schema): named
      subsets, each ``{models: [names]|{...}, datasets: [names]|{...},
      base: str, defaults: {}, importance_runs: {}, skip: []}``; model/
      dataset name lists refer to the top-level catalogs.  Entry names
      become ``base_model_dataset`` and the group name is recorded in
      the job manifest (``jobs.yaml``) for ``--group`` filtering;
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
    all_models = settings.get("models") or {"": {}}
    all_datasets = settings.get("datasets") or {"": {}}
    defaults = settings.get("defaults") or {}
    skip = set(settings.get("skip") or ())
    minimize_defaults = settings.get("minimize_defaults")
    all_importance = settings.get("importance_runs") or {}
    importance_defaults = settings.get("importance_defaults") or {}
    cov_dir = settings.get("cov_dir")
    # normalize to the group schema: no groups = one anonymous group over
    # the full model x dataset cross
    groups = settings.get("groups") or {
        "": {"models": all_models, "datasets": all_datasets}}

    def catalog(selection, catalog_dict, what):
        if selection is None:
            return dict(catalog_dict)
        if isinstance(selection, Mapping):
            return dict(selection)
        out = {}
        for name in selection:
            if name not in catalog_dict:
                raise LoggedError(log, "%s '%s' not defined in the "
                                  "top-level catalog.", what, name)
            out[name] = catalog_dict[name]
        return out

    os.makedirs(os.path.join(grid_dir, "input_files"), exist_ok=True)
    yaml_dump_file(
        os.path.join(grid_dir, "grid_settings.yaml"),
        {"groups": {g: {"models": list(catalog(spec.get("models"),
                                               all_models, "Model")),
                        "datasets": list(catalog(spec.get("datasets"),
                                                 all_datasets, "Dataset"))}
                    for g, spec in groups.items()},
         "importance_runs": list(all_importance),
         "minimize": minimize_defaults is not None},
    )
    created = []
    jobs: list[batch.JobItem] = []

    def dump(name, info, **job_fields):
        path = os.path.join(grid_dir, "input_files", name + ".yaml")
        yaml_dump_file(path, info, error_if_exists=False)
        created.append(path)
        jobs.append(batch.JobItem(
            name=name, input_file=os.path.join("input_files",
                                               name + ".yaml"),
            **job_fields))
        return path

    for g_name, g_spec in groups.items():
        models = catalog(g_spec.get("models"), all_models, "Model")
        datasets = catalog(g_spec.get("datasets"), all_datasets, "Dataset")
        base = g_spec.get("base") or settings.get("base") or ""
        g_defaults = recursive_update(dict(defaults),
                                      g_spec.get("defaults") or {})
        g_skip = skip | set(g_spec.get("skip") or ())
        importance_runs = dict(all_importance,
                               **(g_spec.get("importance_runs") or {}))
        for m_name, m_info in models.items():
            for d_name, d_info in datasets.items():
                name = "_".join(
                    x for x in (base, m_name, d_name) if x)
                if name in g_skip:
                    continue
                info = recursive_update(
                    recursive_update(dict(g_defaults), m_info or {}),
                    d_info or {},
                )
                prefix = os.path.join(name, name)
                info["output"] = os.path.join(grid_dir, prefix)
                _resolve_auto_covmat(info, cov_dir, name)
                tags = dict(group=g_name, base=base,
                            param_tags=m_name.split("_") if m_name else [],
                            data_tags=d_name.split("_") if d_name else [])
                dump(name, info, kind="chains", output_prefix=prefix,
                     **tags)
                if minimize_defaults is not None:
                    info_min = dict(info)
                    info_min["sampler"] = {
                        "minimize": dict(minimize_defaults or {})
                    }
                    dump(name + ".minimize", info_min, kind="minimize",
                         parent=name, output_prefix=prefix, **tags)
                for tag, post_frag in importance_runs.items():
                    post = recursive_update(dict(importance_defaults),
                                            post_frag or {})
                    post["suffix"] = tag
                    info_post = {"output": info["output"], "post": post,
                                 "force": True}
                    dump(f"{name}.post.{tag}", info_post,
                         kind="importance", parent=name,
                         importance_tag=tag,
                         output_prefix=f"{prefix}.post.{tag}", **tags)
                    if minimize_defaults is not None:
                        info_pm = dict(info)
                        info_pm["sampler"] = {
                            "minimize": dict(minimize_defaults or {})
                        }
                        # minimize over the importance-updated pipeline:
                        # start from the post output chain
                        info_pm["output"] = f"{info['output']}.post.{tag}"
                        info_pm = recursive_update(
                            info_pm, post.get("add") or {})
                        for name_r in (post.get("remove") or {}).get(
                                "likelihood", []):
                            info_pm.get("likelihood", {}).pop(name_r, None)
                        dump(f"{name}.post.{tag}.minimize", info_pm,
                             kind="importance_minimize", parent=name,
                             importance_tag=tag,
                             output_prefix=f"{prefix}.post.{tag}", **tags)
    batch.save_jobs(grid_dir, jobs)
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


def grid_inputs(grid_dir: str, kind: str = "chains",
                jobs=None) -> list[str]:
    """Job input files of one kind: chains (parents), minimize,
    importance, or importance_minimize."""
    if jobs is None:
        jobs = batch.load_jobs(grid_dir)
    return [os.path.join(grid_dir, j.input_file) for j in jobs
            if j.kind == kind]


def run_grid(grid_dir: str, dry_run: bool = False,
             job_template: Optional[str] = None,
             resume: bool = True, kind: str = "chains",
             jobs=None) -> list:
    """Run every grid job of ``kind`` (sequentially), or emit submission
    commands.

    Derived jobs run after their parents: chains first, then
    ``--importance`` (post-processing over the stored chains) and
    ``--minimize``; ``--importance-minimize`` last (reference ordering,
    gridconfig.py:345-350).

    ``job_template``: a string with ``{input}`` and ``{name}`` placeholders;
    when given, the filled commands are printed/returned instead of running
    in-process (plug into sbatch & co.).

    ``jobs``: an optional pre-filtered :func:`batch.load_jobs` subset
    (see :class:`batch.BatchFilter`); default = every job of ``kind``.
    """
    results = []
    for path in grid_inputs(grid_dir, kind=kind, jobs=jobs):
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


def grid_status(grid_dir: str, jobs=None) -> dict[str, str]:
    """Status per grid job (all kinds): not started / in progress / done."""
    status = {}
    for job in (batch.load_jobs(grid_dir) if jobs is None else jobs):
        if job.kind != "chains":
            status[job.name] = ("done" if job.chain_exists(grid_dir)
                                else "not started")
        elif job.chain_finished(grid_dir):
            status[job.name] = "done"
        elif job.checkpoint_file(grid_dir):
            status[job.name] = "in progress"
        else:
            status[job.name] = "not started"
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
    parser.add_argument("--minimize", action="store_true",
                        help="run the per-entry minimize jobs")
    parser.add_argument("--importance-minimize", action="store_true",
                        help="run minimize jobs over the post outputs")
    batch.BatchFilter.add_arguments(parser, notexist=True)
    ns = parser.parse_args(args)
    # reference semantics (gridrun.py:100-109): --importance [tags...]
    # selects the importance (post) jobs; --minimize their/--the minimize
    # variants; plain = the parent chains
    kind = ("importance_minimize" if ns.importance_minimize else
            "minimize" if ns.minimize else
            "importance" if ns.importance is not None else "chains")
    jobs = batch.BatchFilter.select(batch.load_jobs(ns.grid_dir), ns,
                                    grid_dir=ns.grid_dir, kinds=(kind,))
    run_grid(ns.grid_dir, dry_run=ns.dry_run, job_template=ns.job_template,
             kind=kind, jobs=jobs)
