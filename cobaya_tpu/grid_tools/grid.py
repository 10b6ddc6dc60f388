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

    Settings keys: ``models`` (name -> info fragment), ``datasets``
    (name -> info fragment), ``defaults`` (common info), ``skip`` (list of
    'model_dataset' names to omit).
    """
    settings = _load_settings(settings)
    models = settings.get("models") or {"": {}}
    datasets = settings.get("datasets") or {"": {}}
    defaults = settings.get("defaults") or {}
    skip = set(settings.get("skip") or ())
    os.makedirs(os.path.join(grid_dir, "input_files"), exist_ok=True)
    yaml_dump_file(
        os.path.join(grid_dir, "grid_settings.yaml"),
        {"models": list(models), "datasets": list(datasets)},
    )
    created = []
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
            path = os.path.join(grid_dir, "input_files", name + ".yaml")
            yaml_dump_file(path, info)
            created.append(path)
    log.info("Created grid with %d runs under '%s'.", len(created), grid_dir)
    return created


def grid_inputs(grid_dir: str) -> list[str]:
    folder = os.path.join(grid_dir, "input_files")
    return sorted(
        os.path.join(folder, f) for f in os.listdir(folder)
        if f.endswith(".yaml")
    )


def run_grid(grid_dir: str, dry_run: bool = False,
             job_template: Optional[str] = None,
             resume: bool = True) -> list:
    """Run every grid entry (sequentially), or emit submission commands.

    ``job_template``: a string with ``{input}`` and ``{name}`` placeholders;
    when given, the filled commands are printed/returned instead of running
    in-process (plug into sbatch & co.).
    """
    results = []
    for path in grid_inputs(grid_dir):
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

        log.info("Running grid entry '%s'...", name)
        try:
            results.append(run(path, resume=resume))
        except Exception as exc:
            log.error("Grid entry '%s' failed: %s", name, exc)
            results.append(exc)
    return results


def grid_status(grid_dir: str) -> dict[str, str]:
    """Status per grid entry: missing / running / done (checkpoint-based)."""
    from ..utils import conventions as cv

    status = {}
    for path in grid_inputs(grid_dir):
        name = os.path.splitext(os.path.basename(path))[0]
        info = load_input_dict(path)
        prefix = info.get("output")
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
    ns = parser.parse_args(args)
    run_grid(ns.grid_dir, dry_run=ns.dry_run, job_template=ns.job_template)
