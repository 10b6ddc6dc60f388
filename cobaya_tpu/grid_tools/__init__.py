"""Grids of runs over models x datasets.

Capability parity with /root/reference/cobaya/grid_tools/: create a
directory of run inputs for every (model, dataset) combination from a grid
settings file (grid.py), run them locally or submit them through a cluster
queue with templated job scripts and a job-id index (jobqueue.py), track
convergence/progress, clean up, copy and extract outputs (gridmanage.py),
and generate LaTeX constraint tables (gridtables.py).

TPU-first note: there is no mpirun wrapping — TPU pods schedule whole
hosts, so one grid entry = one ``cobaya-tpu run`` process; the submission
templates reserve chips, not MPI ranks.
"""

from .grid import (
    create_grid,
    grid_create_script,
    grid_run_script,
    grid_status,
    run_grid,
)
from .gridmanage import (
    grid_cleanup,
    grid_copy,
    grid_extract,
    grid_list,
    grid_progress,
)
from .gridtables import grid_tables
from .jobqueue import JobIndex, JobSettings, delete_jobs, submit_job
