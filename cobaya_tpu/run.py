"""Run orchestration: input -> output -> model -> sampler -> products.

Capability parity with /root/reference/cobaya/run.py: ``run()`` loads and
expands the input, sets up the output driver (dumping ``.input.yaml`` and
``.updated.yaml`` with resume-compatibility checks), builds the Model and the
Sampler, runs it, and returns ``(updated_info, sampler)``.  Includes the
``--minimize`` override, ``--test`` init-only mode, and the CLI entry point.
"""

from __future__ import annotations

import argparse
from collections import namedtuple
from typing import Optional

from .models.input_ import load_info_overrides, load_input_dict, update_info
from .models.model import Model
from .utils.log import LoggedError, get_logger, logger_setup
from .utils.tools import recursive_update

InfoSamplerTuple = namedtuple("InfoSamplerTuple", ["info", "sampler"])

log = get_logger("run")


def run(
    info_or_yaml_or_file,
    packages_path: Optional[str] = None,
    output: Optional[str] = None,
    debug: Optional[bool] = None,
    stop_at_error: Optional[bool] = None,
    resume: bool = False,
    force: bool = False,
    minimize: Optional[bool] = None,
    no_mpi: bool = False,
    test: Optional[bool] = None,
    override: Optional[dict] = None,
    allow_changes: bool = False,
) -> InfoSamplerTuple:
    """Run a sampler on a model, as declared in the input."""
    from .io.output import get_output
    from .parallel import state as pstate
    from .samplers.sampler import get_sampler

    pstate.maybe_init_distributed(no_mpi=no_mpi)
    info = load_input_dict(info_or_yaml_or_file)
    if override:
        info = recursive_update(info, override)
    info = load_info_overrides(
        info, packages_path=packages_path, debug=debug,
        stop_at_error=stop_at_error, resume=resume, force=force, test=test,
    )
    if output is not None:
        info["output"] = output
    if info.get("post"):
        from .post import post

        return post(info)
    logger_setup(info.get("debug"))
    if minimize:
        info["sampler"] = {"minimize": (info.get("sampler") or {}).get(
            "minimize") or {}}
    if not info.get("sampler"):
        raise LoggedError(log, "No sampler block given!")
    out = get_output(
        prefix=info.get("output"),
        # --minimize on an existing run reuses its products (starts from the
        # previous MAP) rather than overwriting them
        resume=bool(info.get("resume")) or bool(minimize),
        force=bool(info.get("force")),
    )
    try:
        updated_info = update_info(info)
        if out:
            # allow_changes skips the resume-consistency diff (reference
            # run.py:129: check_compatible=not allow_changes)
            out.check_and_dump_info(info, updated_info,
                                    ignore_blocks=["sampler"],
                                    check_compatible=not allow_changes)
        model = Model(
            updated_info.get("params") or {},
            updated_info.get("likelihood") or {},
            info_prior=updated_info.get("prior"),
            info_theory=updated_info.get("theory"),
            packages_path=updated_info.get("packages_path"),
            timing=updated_info.get("timing"),
            stop_at_error=bool(updated_info.get("stop_at_error", False)),
            matmul_precision=updated_info.get("matmul_precision", "highest"),
        )
        sampler = get_sampler(
            updated_info["sampler"], model, out,
            packages_path=updated_info.get("packages_path"),
        )
        # re-dump with the sampler's resolved options
        name = list(updated_info["sampler"])[0]
        updated_info["sampler"][name] = sampler._input_options | {
            k: getattr(sampler, k)
            for k in sampler.get_defaults(input_options={})
            if hasattr(sampler, k) and not callable(getattr(sampler, k))
        }
        if out:
            out.check_and_dump_info(None, updated_info,
                                    check_compatible=False)
        if info.get("test"):
            log.info("Test initialization successful! "
                     "You can probably run this input.")
            # release the output-prefix FileLock: a test init holds no
            # products, and a following run(info) in the same process must
            # be able to acquire the lock
            if out:
                out.close()
            return InfoSamplerTuple(updated_info, sampler)
        # cross-process error propagation: one process's failure aborts its
        # peers at their next sync point instead of deadlocking them
        # (reference mpi.py:350-467)
        with pstate.ProcessState("sampler.run"):
            sampler.run()
    except BaseException:
        # a failed run must not leave the output prefix locked: the user
        # retries (e.g. after an incompatible-resume error) immediately
        if out:
            out.close()
        raise
    if out:
        out.close()
    return InfoSamplerTuple(updated_info, sampler)


def run_script(args=None):
    parser = argparse.ArgumentParser(
        prog="cobaya-tpu run", description="Run a sampling job."
    )
    parser.add_argument("input_file", help="Input YAML file")
    parser.add_argument("-p", "--packages-path", default=None)
    parser.add_argument("-o", "--output", default=None)
    parser.add_argument("-d", "--debug", action="store_true", default=None)
    continuation = parser.add_mutually_exclusive_group(required=False)
    continuation.add_argument("-r", "--resume", action="store_true")
    continuation.add_argument("-f", "--force", action="store_true")
    parser.add_argument("-M", "--minimize", action="store_true", default=None)
    parser.add_argument("--test", action="store_true", default=None)
    parser.add_argument(
        "--allow-changes", action="store_true",
        help="Allow changing input parameters when resuming or minimizing, "
             "skipping consistency checks (reference run.py --allow-changes)")
    parser.add_argument(
        "--no-mpi", action="store_true",
        help="Disable multi-process coordination (single-process run)")
    from . import __version__

    parser.add_argument("--version", action="version", version=__version__)
    ns = parser.parse_args(args)
    # CLI semantics: a file input defaults the output prefix to the input
    # file's name (reference input.py:112 via run_script)
    from .models.input_ import load_input

    run(
        load_input(ns.input_file),
        packages_path=ns.packages_path, output=ns.output,
        debug=ns.debug, resume=ns.resume, force=ns.force,
        minimize=ns.minimize, test=ns.test,
        allow_changes=ns.allow_changes, no_mpi=ns.no_mpi,
    )


if __name__ == "__main__":
    run_script()
