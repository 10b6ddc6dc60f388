"""Cluster job queue: submission templates, job records, queue queries.

Capability parity with /root/reference/cobaya/grid_tools/jobqueue.py
(JobSettings, JobIndex, submitJob, queue_job_details, deleteJobs) and the
script_templates/ directory.  TPU-first deviations: job records are a
human-readable YAML index instead of pickles, and the built-in templates
target SLURM/PBS plus a plain-shell engine for TPU-VM style hosts where
runs are launched directly (XLA owns intra-host parallelism, so there is
no mpirun wrapping — one process per job).
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
from dataclasses import dataclass, field
from typing import Optional

from ..utils.log import LoggedError, get_logger
from ..utils.yamlio import yaml_dump_file, yaml_load_file

log = get_logger("jobqueue")

JOB_INDEX_FILE = "batch_jobs.yaml"

# Submission templates.  Placeholders: {jobname} {walltime} {queue} {chips}
# {logdir} {command}.  The 'sh' engine runs the script in-process (useful on
# single TPU-VM hosts and in tests).
TEMPLATES = {
    "slurm": """#!/bin/bash
#SBATCH --job-name={jobname}
#SBATCH --time={walltime}
#SBATCH --nodes=1
#SBATCH --ntasks-per-node=1
#SBATCH --cpus-per-task={chips}
#SBATCH --partition={queue}
#SBATCH --output={logdir}/{jobname}.log
{command}
""",
    "pbs": """#!/bin/bash
#PBS -N {jobname}
#PBS -l walltime={walltime}
#PBS -q {queue}
#PBS -o {logdir}/{jobname}.log
#PBS -j oe
cd $PBS_O_WORKDIR
{command}
""",
    "sh": """#!/bin/bash
# local/TPU-VM execution (no scheduler)
{command} > {logdir}/{jobname}.log 2>&1
""",
}

SUBMIT_COMMANDS = {"slurm": "sbatch", "pbs": "qsub", "sh": "bash"}
DELETE_COMMANDS = {"slurm": "scancel", "pbs": "qdel", "sh": "kill"}
QUEUE_COMMANDS = {"slurm": ["squeue", "-h", "-o", "%i %j %t"],
                  "pbs": ["qstat"]}


@dataclass
class JobSettings:
    """Per-job submission settings (reference jobqueue.py:90)."""

    jobname: str
    inputs: list[str] = field(default_factory=list)
    walltime: str = "24:00:00"
    queue: str = "normal"
    chips: int = 8  # TPU chips / cores requested
    engine: str = "sh"
    program: str = "python -m cobaya_tpu run {input} --resume"
    template: Optional[str] = None  # path to a custom template file

    def command(self) -> str:
        return "\n".join(
            self.program.format(input=os.path.abspath(p)) for p in self.inputs
        )

    def script_text(self, logdir: str) -> str:
        if self.template:
            with open(self.template, encoding="utf-8") as f:
                text = f.read()
        else:
            if self.engine not in TEMPLATES:
                raise LoggedError(
                    log, "Unknown queue engine '%s' (know %s) and no "
                    "template given.", self.engine, sorted(TEMPLATES),
                )
            text = TEMPLATES[self.engine]
        return text.format(
            jobname=self.jobname, walltime=self.walltime, queue=self.queue,
            chips=self.chips, logdir=logdir, command=self.command(),
        )


class JobIndex:
    """Record of submitted jobs, one YAML file per grid/batch directory
    (reference jobqueue.py:209 stores pickles; YAML is greppable)."""

    def __init__(self, batch_path: str):
        self.path = os.path.join(batch_path, JOB_INDEX_FILE)
        self.jobs: dict[str, dict] = {}
        if os.path.exists(self.path):
            self.jobs = yaml_load_file(self.path) or {}

    def add(self, job_id: str, jobname: str, inputs: list[str], engine: str):
        self.jobs[str(job_id)] = {
            "name": jobname, "inputs": list(inputs), "engine": engine,
        }
        self.save()

    def delete(self, job_id: str):
        self.jobs.pop(str(job_id), None)
        self.save()

    def by_name(self, name: str) -> Optional[str]:
        for job_id, rec in self.jobs.items():
            if rec.get("name") == name or name in (rec.get("inputs") or ()):
                return job_id
        return None

    def save(self):
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        yaml_dump_file(self.path, self.jobs)


def parse_job_id(submit_output: str) -> str:
    """Job id from scheduler output ('Submitted batch job 123', '123.head')."""
    match = re.search(r"(\d+)", submit_output)
    return match.group(1) if match else submit_output.strip()


def submit_job(batch_path: str, settings: JobSettings,
               dry_run: bool = False) -> Optional[str]:
    """Fill the template, write the script, submit, and record the job id."""
    scripts = os.path.join(batch_path, "scripts")
    logdir = os.path.join(batch_path, "logs")
    os.makedirs(scripts, exist_ok=True)
    os.makedirs(logdir, exist_ok=True)
    script = os.path.join(scripts, settings.jobname + ".sh")
    with open(script, "w", encoding="utf-8") as f:
        f.write(settings.script_text(logdir))
    os.chmod(script, 0o755)
    if dry_run:
        log.info("[dry-run] would submit '%s'", script)
        return None
    submit = SUBMIT_COMMANDS.get(settings.engine, "bash")
    if shutil.which(submit) is None:
        raise LoggedError(log, "Submit command '%s' not found.", submit)
    res = subprocess.run(
        [submit, script], capture_output=True, text=True, check=True,
    )
    job_id = parse_job_id(res.stdout or settings.jobname)
    JobIndex(batch_path).add(job_id, settings.jobname, settings.inputs,
                             settings.engine)
    log.info("Submitted '%s' as job %s.", settings.jobname, job_id)
    return job_id


def queue_job_details(engine: str = "slurm") -> list[tuple[str, str, str]]:
    """(id, name, state) rows from the scheduler queue, [] if unavailable."""
    cmd = QUEUE_COMMANDS.get(engine)
    if not cmd or shutil.which(cmd[0]) is None:
        return []
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             check=True).stdout
    except subprocess.CalledProcessError:
        return []
    rows = []
    for line in out.splitlines():
        parts = line.split()
        if len(parts) >= 3 and parts[0][0].isdigit():
            rows.append((parts[0], parts[1], parts[2]))
    return rows


def queue_job_names(engine: str = "slurm") -> list[str]:
    return [name for _, name, _ in queue_job_details(engine)]


def delete_jobs(batch_path: str, names: Optional[list[str]] = None,
                dry_run: bool = False) -> list[str]:
    """Cancel queued/running jobs recorded in the index (by name, or all)."""
    index = JobIndex(batch_path)
    targets = []
    for job_id, rec in list(index.jobs.items()):
        if names and rec.get("name") not in names:
            continue
        targets.append(job_id)
        if dry_run:
            continue
        killer = DELETE_COMMANDS.get(rec.get("engine", "sh"), "kill")
        if shutil.which(killer) is not None:
            subprocess.run([killer, job_id], capture_output=True, text=True,
                           check=False)
        index.delete(job_id)
    return targets


def run_job_script(args=None):
    """Submit a single input file to the cluster queue.

    Reference: cobaya/grid_tools/runMPI.py:10 (cobaya-run-job) — wraps one
    (or more) input yaml(s) in a batch script and submits it; with
    --engine sh (the default outside a scheduler) the job simply runs in
    the foreground via bash.
    """
    import argparse

    from ..utils.log import logger_setup

    logger_setup()
    parser = argparse.ArgumentParser(prog="cobaya-tpu run-job")
    parser.add_argument("input_file", nargs="+")
    parser.add_argument("--engine", default=None,
                        help="slurm | pbs | sh (default: auto-detect)")
    parser.add_argument("--queue", default="normal")
    parser.add_argument("--walltime", default="24:00:00")
    parser.add_argument("--chips", type=int, default=8)
    parser.add_argument("--program", default=None,
                        help="override the per-input run command")
    parser.add_argument("--batch-path", default=".",
                        help="where scripts/logs/the job index are kept")
    parser.add_argument("--dry-run", action="store_true")
    ns = parser.parse_args(args)
    engine = ns.engine
    if engine is None:
        engine = ("slurm" if shutil.which("sbatch")
                  else "pbs" if shutil.which("qsub") else "sh")
    jobname = os.path.splitext(os.path.basename(ns.input_file[0]))[0]
    settings = JobSettings(
        jobname=jobname, inputs=list(ns.input_file), walltime=ns.walltime,
        queue=ns.queue, chips=ns.chips, engine=engine,
        **({"program": ns.program} if ns.program else {}),
    )
    job_id = submit_job(ns.batch_path, settings, dry_run=ns.dry_run)
    if job_id is not None:
        print(f"submitted {jobname} as job {job_id} ({engine})")
