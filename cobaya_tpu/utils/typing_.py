"""Typed input-dictionary vocabulary and runtime validation.

Mirrors the capability of /root/reference/cobaya/typing.py: TypedDicts for the
input blocks, the set of allowed per-parameter keys (``partags``), and a
lightweight runtime type validator used when strict checking is enabled.
"""

from __future__ import annotations

import numbers
import os
from collections.abc import Mapping, Sequence
from typing import Any, Callable, Dict, Optional, TypedDict, Union

ParamValuesDict = Dict[str, float]
TheoryDict = Dict[str, Any]
LikeDict = Dict[str, Any]
SamplerDict = Dict[str, Any]

# Allowed keys inside a single parameter's info dict.
partags = {
    "prior", "ref", "proposal", "value", "drop", "derived", "latex",
    "renames", "min", "max", "periodic",
}


class ParamDict(TypedDict, total=False):
    prior: Union[None, Sequence, dict]
    ref: Union[None, float, Sequence, dict]
    proposal: Optional[float]
    value: Union[None, float, str, Callable]
    drop: bool
    derived: Union[bool, str, Callable]
    latex: str
    renames: Union[str, Sequence]
    min: float
    max: float
    periodic: bool


ParamsDict = Dict[str, Union[ParamDict, None, str, float, list]]


class InputDict(TypedDict, total=False):
    params: ParamsDict
    theory: Dict[str, Optional[TheoryDict]]
    likelihood: Dict[str, Optional[LikeDict]]
    prior: Dict[str, Any]
    sampler: Dict[str, Optional[SamplerDict]]
    post: Dict[str, Any]
    output: Optional[str]
    packages_path: Optional[str]
    debug: Union[bool, int, str, None]
    resume: bool
    force: bool
    test: bool
    timing: bool
    stop_at_error: bool
    seed: Optional[int]
    version: Optional[str]
    matmul_precision: Optional[str]


class PostDict(TypedDict, total=False):
    add: Optional[InputDict]
    remove: Optional[InputDict]
    suffix: Optional[str]
    skip: Union[None, float, int]
    thin: Optional[int]
    output: Optional[str]


LiteralFalse = bool  # placeholder alias for annotation parity

enforce_type_checking: bool = bool(os.environ.get("COBAYA_TPU_STRICT_TYPES"))


def kind_of_number(x) -> bool:
    return isinstance(x, numbers.Number) and not isinstance(x, bool)


def validate_type(annotation: Any, value: Any, name: str = "") -> None:
    """Best-effort runtime check of ``value`` against a type annotation.

    Only performs the checks that matter for catching user input mistakes
    (numbers vs strings vs mappings vs sequences); silently accepts anything
    it cannot interpret.
    """
    if value is None or annotation is Any or annotation is None:
        return
    origin = getattr(annotation, "__origin__", None)
    args = getattr(annotation, "__args__", ())
    if origin is Union:
        for a in args:
            try:
                validate_type(a, value, name)
                return
            except TypeError:
                continue
        raise TypeError(
            f"{name}: value {value!r} does not match any of {args}"
        )
    if annotation in (int,):
        if not (isinstance(value, numbers.Integral) and not isinstance(value, bool)):
            raise TypeError(f"{name}: expected int, got {value!r}")
        return
    if annotation in (float,):
        if not kind_of_number(value):
            raise TypeError(f"{name}: expected number, got {value!r}")
        return
    if annotation in (bool,):
        if not isinstance(value, bool):
            raise TypeError(f"{name}: expected bool, got {value!r}")
        return
    if annotation in (str,):
        if not isinstance(value, str):
            raise TypeError(f"{name}: expected str, got {value!r}")
        return
    if origin in (dict, Mapping) or annotation in (dict, Mapping):
        if not isinstance(value, Mapping):
            raise TypeError(f"{name}: expected mapping, got {value!r}")
        return
    if origin in (list, tuple, Sequence) or annotation in (list, tuple):
        if isinstance(value, str) or not isinstance(value, Sequence):
            if not hasattr(value, "__array__"):
                raise TypeError(f"{name}: expected sequence, got {value!r}")
        return
    # Unknown annotation: accept.
    return
