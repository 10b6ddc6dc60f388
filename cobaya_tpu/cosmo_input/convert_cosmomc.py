"""CosmoMC .ini → cobaya-style input converter.

Capability parity with the reference's CosmoMC conversion utilities in
cosmo_input: reads a CosmoMC-format ini (``param[x] = center min max
start_width propose_width`` lines plus settings) and an optional
``.paramnames`` file, and produces an input dict with the equivalent
params block and sampler settings.
"""

from __future__ import annotations

import os
from typing import Optional

from ..likelihoods.base_classes.dataset import IniFile
from ..utils.log import get_logger

log = get_logger("convert_cosmomc")


def convert_cosmomc_ini(ini_file: str,
                        paramnames_file: Optional[str] = None) -> dict:
    """Input dict from a CosmoMC ini (params, proposal scale, covmat)."""
    ini = IniFile(ini_file)
    labels = {}
    if paramnames_file and os.path.exists(paramnames_file):
        with open(paramnames_file, encoding="utf-8") as f:
            for line in f:
                parts = line.split(None, 1)
                if len(parts) == 2:
                    labels[parts[0].strip("*")] = parts[1].strip()
    params: dict = {}
    for key, value in ini.params.items():
        if not (key.startswith("param[") and key.endswith("]")):
            continue
        name = key[len("param["):-1]
        fields = [float(v) for v in str(value).split()]
        if len(fields) == 1 or (len(fields) >= 3
                                and fields[1] == fields[2]):
            params[name] = fields[0]
        else:
            center, lo, hi = fields[0], fields[1], fields[2]
            start_width = fields[3] if len(fields) > 3 else (hi - lo) / 10
            proposal = fields[4] if len(fields) > 4 else start_width
            params[name] = {
                "prior": {"min": lo, "max": hi},
                "ref": {"dist": "norm", "loc": center,
                        "scale": max(start_width, 1e-30)},
                "proposal": proposal,
            }
        if name in labels:
            entry = params[name]
            if isinstance(entry, dict):
                entry["latex"] = labels[name]
    info: dict = {"params": params}
    sampler: dict = {}
    if "propose_scale" in ini.params:
        sampler["proposal_scale"] = ini.float("propose_scale")
    if "temperature" in ini.params:
        sampler["temperature"] = ini.float("temperature")
    if ini.params.get("propose_matrix"):
        sampler["covmat"] = ini.relativeFileName("propose_matrix")
    info["sampler"] = {"mcmc": sampler or None}
    if ini.params.get("file_root"):
        info["output"] = ini.string("file_root")
    log.info("Converted %d parameters from '%s'.", len(params), ini_file)
    return info
