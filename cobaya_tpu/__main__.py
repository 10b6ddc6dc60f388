"""``python -m cobaya_tpu <command>`` dispatcher.

Capability parity with /root/reference/cobaya/__main__.py and the console
entry points in the reference's pyproject: run, post, doc, bib, install,
grid-create/run/tables/converge/list/cleanup/copy/extract, running-jobs,
delete-jobs, cosmo-generator.
"""

import sys


def _commands():
    from .bib import bib_script
    from .doc import doc_script
    from .grid_tools.grid import grid_create_script, grid_run_script
    from .grid_tools.gridmanage import (
        delete_jobs_script,
        grid_cleanup_script,
        grid_copy_script,
        grid_extract_script,
        grid_getdist_script,
        grid_list_script,
        running_jobs_script,
    )
    from .grid_tools.gridtables import (
        grid_converge_script,
        grid_tables_compare_script,
        grid_tables_script,
    )
    from .grid_tools.jobqueue import run_job_script
    from .install import install_script
    from .run import run_script

    def post_script(args):
        from .post import post

        post(args[0])

    def cosmo_generator_script(args):
        from .cosmo_input.gui import gui_script

        gui_script(args)

    return {
        "run": run_script,
        "post": post_script,
        "doc": doc_script,
        "bib": bib_script,
        "install": install_script,
        "grid-create": grid_create_script,
        "grid-run": grid_run_script,
        "grid-tables": grid_tables_script,
        "grid-tables-compare": grid_tables_compare_script,
        "grid-converge": grid_converge_script,
        "grid-list": grid_list_script,
        "grid-getdist": grid_getdist_script,
        "grid-cleanup": grid_cleanup_script,
        "grid-copy": grid_copy_script,
        "grid-extract": grid_extract_script,
        "run-job": run_job_script,
        "running-jobs": running_jobs_script,
        "delete-jobs": delete_jobs_script,
        "cosmo-generator": cosmo_generator_script,
    }


def run_command():
    commands = _commands()
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("Usage: python -m cobaya_tpu <command> ...\nCommands: "
              + ", ".join(commands))
        sys.exit(0 if len(sys.argv) >= 2 else 1)
    command, args = sys.argv[1], sys.argv[2:]
    handler = commands.get(command.lower())
    if handler is None:
        if command.startswith("-"):
            print(f"Unknown option '{command}'. Commands: "
                  + ", ".join(commands))
            sys.exit(1)
        # `python -m cobaya_tpu input.yaml` == `... run input.yaml`
        # (reference __main__.py:44: ANY unknown non-flag first token is
        # treated as a run input file; load_input reports a missing file)
        from .run import run_script

        run_script(sys.argv[1:])
        return
    handler(args)


if __name__ == "__main__":
    run_command()
