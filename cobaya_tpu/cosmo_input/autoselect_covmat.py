"""Automatic proposal-covariance selection from a covmat library.

Capability parity with
/root/reference/cobaya/cosmo_input/autoselect_covmat.py: given the model's
sampled parameters (with their renames/aliases) and the data combination
(likelihood ``aliases``), scan a directory of ``.covmat`` files (CosmoMC
format: header of parameter names, then the matrix) and pick the best match
by a simple score: number of matching sampled parameters, tie-broken by
matching data tags in the file name.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..utils.log import get_logger

log = get_logger("autoselect_covmat")


def get_best_covmat(
    params_renames: dict[str, list],
    like_aliases: list[str],
    covmats_folder: str,
) -> Optional[dict]:
    """Best-matching covmat: {'name', 'params', 'covmat'} or None."""
    if not covmats_folder or not os.path.isdir(covmats_folder):
        return None
    wanted = {
        p: {p, *map(str, renames or [])} for p, renames in
        params_renames.items()
    }
    tags = [a.lower() for a in like_aliases]
    best = None
    for fname in sorted(os.listdir(covmats_folder)):
        if not fname.endswith(".covmat"):
            continue
        path = os.path.join(covmats_folder, fname)
        try:
            with open(path, encoding="utf-8") as f:
                header = f.readline()
            names = header.lstrip("#").split()
        except OSError:
            continue
        n_match = sum(
            1 for p, alts in wanted.items() if alts & set(names)
        )
        if n_match == 0:
            continue
        n_tags = sum(1 for t in tags if t in fname.lower())
        score = (n_match, n_tags)
        if best is None or score > best[0]:
            best = (score, fname, path, names)
    if best is None:
        return None
    _, fname, path, names = best
    log.info("Selected covmat '%s' (%d matching params).", fname, best[0][0])
    return {
        "name": fname,
        "params": names,
        "covmat": np.atleast_2d(np.loadtxt(path)),
    }
