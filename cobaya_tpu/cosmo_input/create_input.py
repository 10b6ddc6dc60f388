"""Combine input-database building blocks into a full run input.

Capability parity with /root/reference/cobaya/cosmo_input/create_input.py.
"""

from __future__ import annotations

from copy import deepcopy

from ..utils.tools import recursive_update
from . import input_database


_FIELD_ORDER = [
    "primordial", "geometry", "hubble", "matter", "neutrinos",
    "dark_energy", "bbn", "reionization",
]
_LIKE_FIELDS = ["like_cmb", "like_bao", "like_des", "like_sn", "like_H0"]


def create_input(get_comments: bool = False, preset: str | None = None,
                 **kwargs) -> dict:
    """Build an input dict from field choices (or a named preset)."""
    if preset:
        fields = deepcopy(input_database.preset[preset])
        fields.pop("desc", None)
        fields.update(kwargs)
        return create_input(get_comments=get_comments, **fields)
    theory_requested = kwargs.get("theory", "camb")
    merged: dict = {"theory": {theory_requested: None}, "params": {},
                    "likelihood": {}}
    comments = []
    for field in _FIELD_ORDER + _LIKE_FIELDS:
        choice = kwargs.get(field, input_database.none)
        db = getattr(input_database, field)
        if choice not in db:
            raise ValueError(f"Unknown value '{choice}' for '{field}' "
                             f"(available: {sorted(db)})")
        info = deepcopy(db[choice])
        if not info:
            continue
        desc = info.pop("desc", None)
        if desc:
            comments.append(f"{field}: {desc}")
        theory_info = info.pop("theory", None)
        if theory_info is not None:
            if theory_requested not in theory_info:
                raise ValueError(
                    f"No preset for '{desc or field}' with theory "
                    f"'{theory_requested}'."
                )
            block = theory_info[theory_requested]
            if block:
                block = dict(block)
                # per-theory sampled/derived params live at the top level
                merged["params"].update(block.pop("params", {}))
                if block:
                    merged["theory"][theory_requested] = recursive_update(
                        merged["theory"][theory_requested] or {}, block
                    )
        merged["params"].update(info.pop("params", {}))
        merged["likelihood"].update(info.pop("likelihood", {}))
        merged = recursive_update(merged, info)
    sampler_choice = kwargs.get("sampler")
    if sampler_choice:
        merged = recursive_update(
            merged, deepcopy(input_database.sampler[sampler_choice])
        )
        merged.pop("desc", None)
    if not merged["likelihood"]:
        merged.pop("likelihood")
    if get_comments:
        merged["comment"] = comments
    return merged
