"""CosmoMC-style ``.dataset`` ini-file likelihood base.

Capability parity with
/root/reference/cobaya/likelihoods/base_classes/DataSetLikelihood.py,
including an own IniFile reader (the reference borrows getdist's).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ...models.component import ComponentNotInstalledError
from ...utils.log import LoggedError
from .installable import InstallableLikelihood


class IniFile:
    """Minimal CosmoMC-format ini reader: ``key = value`` lines, comments
    with ``#`` or ``;``, INCLUDE directives, typed getters."""

    def __init__(self, filename: str | None = None):
        self.params: dict[str, str] = {}
        self.original_filename = filename
        if filename:
            self._read(filename)

    def _read(self, filename: str):
        base = os.path.dirname(filename)
        with open(filename, encoding="utf-8") as f:
            for line in f:
                line = line.split("#")[0].split(";")[0].strip()
                if not line:
                    continue
                if line.upper().startswith("INCLUDE("):
                    inc = line[len("INCLUDE("):].rstrip(")")
                    self._read(os.path.join(base, inc))
                    continue
                if "=" not in line:
                    continue
                key, _, value = line.partition("=")
                self.params.setdefault(key.strip(), value.strip())

    def string(self, key, default=None) -> str:
        return str(self.params.get(key, default))

    def int(self, key, default=0) -> int:
        return int(float(self.params.get(key, default)))

    def float(self, key, default=0.0) -> float:
        return float(self.params.get(key, default))

    def bool(self, key, default=False) -> bool:
        v = self.params.get(key, default)
        if isinstance(v, bool):
            return v
        return str(v).strip().lower() in ("t", "true", "1", "yes")

    def relativeFileName(self, key, default=None) -> str:
        name = self.string(key, default)
        if name and not os.path.isabs(name) and self.original_filename:
            return os.path.join(
                os.path.dirname(self.original_filename), name
            )
        return name

    def split(self, key, default="") -> list[str]:
        return self.string(key, default).split()

    def array_int(self, key, default="") -> np.ndarray:
        return np.array([int(x) for x in self.split(key, default)])

    def array_float(self, key, default="") -> np.ndarray:
        return np.array([float(x) for x in self.split(key, default)])


class DataSetLikelihood(InstallableLikelihood):
    """Likelihood configured by a CosmoMC ``.dataset`` ini file."""

    _default_dataset_params: dict = {}
    dataset_file: Optional[str] = None
    dataset_params: Optional[dict] = None

    def initialize(self):
        if not self.dataset_file:
            raise LoggedError(self.log, "No 'dataset_file' given.")
        if os.path.isabs(self.dataset_file):
            data_file = self.dataset_file
            self.path = os.path.dirname(data_file)
        else:
            if not self.path and self.get_install_options() \
                    and self.packages_path:
                self.path = self.get_path(self.packages_path)
            self.path = self.path or self.get_class_path()
            data_file = os.path.normpath(
                os.path.join(self.path, self.dataset_file)
            )
        if not os.path.exists(data_file):
            raise ComponentNotInstalledError(
                self.log,
                "Data file '%s' not found at '%s'. Install this likelihood "
                "or fix the packages path.", self.dataset_file, self.path,
            )
        self.load_dataset_file(data_file, self.dataset_params or {})

    def load_dataset_file(self, filename: str, dataset_params=None):
        if ".dataset" not in filename:
            filename += ".dataset"
        ini = IniFile(filename)
        self.dataset_filename = filename
        ini.params.update(self._default_dataset_params)
        ini.params.update(dataset_params or {})
        self.init_params(ini)

    def init_params(self, ini: IniFile):
        raise LoggedError(
            self.log, "init_params must be implemented by %s",
            self.get_name(),
        )
