"""Grids of runs over models x datasets.

Capability parity (compact) with /root/reference/cobaya/grid_tools/: create a
directory of run inputs for every (model, dataset) combination from a grid
settings file, run them (locally sequential, or emitting submission commands
for a cluster queue), and check/track their status.

The reference's SLURM job-queue machinery maps here onto simple command
emission: TPU pods schedule whole hosts, so a grid entry = one
``cobaya-tpu-run`` invocation; plug the emitted commands into any scheduler.
"""

from .grid import (
    create_grid,
    grid_create_script,
    grid_run_script,
    grid_status,
    run_grid,
)
