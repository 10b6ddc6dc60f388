"""Installable likelihood base: data download + fast chi-squared.

Capability parity with
/root/reference/cobaya/likelihoods/base_classes/InstallableLikelihood.py:
class-level ``install_options`` (github release / download url), data paths
under ``<packages_path>/data``, install/check classmethods, and the
``_fast_chi_squared`` quadratic-form helper (here the jittable kernel from
ops.rotation).
"""

from __future__ import annotations

import os
from typing import ClassVar, Optional

from ...models.likelihood import Likelihood
from ...ops.rotation import chi_squared
from ...utils.log import LoggedError


class InstallableLikelihood(Likelihood):
    install_options: ClassVar[dict] = {}
    path: Optional[str] = None

    _fast_chi_squared = staticmethod(chi_squared)

    @classmethod
    def get_install_options(cls) -> dict:
        return cls.install_options or {}

    @classmethod
    def data_folder_name(cls) -> str:
        opts = cls.get_install_options()
        return opts.get("directory") or cls.__name__

    @classmethod
    def get_path(cls, path: str) -> str:
        return os.path.join(path, "data", cls.data_folder_name())

    @classmethod
    def is_installed(cls, path: str | None = None, **kwargs) -> bool:
        if not kwargs.get("data", True) or not cls.get_install_options():
            return True
        if not path:
            return False
        target = cls.get_path(path)
        return os.path.isdir(target) and bool(os.listdir(target))

    @classmethod
    def install(cls, path: str | None = None, data: bool = True,
                no_progress_bars: bool = True, **_kwargs) -> bool:
        opts = cls.get_install_options()
        if not data or not opts:
            return True
        if not path:
            raise LoggedError(None, "Need a packages path to install data.")
        target = cls.get_path(path)
        os.makedirs(target, exist_ok=True)
        from ...install import download_file, download_github_release

        if "github_repository" in opts:
            return download_github_release(
                os.path.join(path, "data"), opts["github_repository"],
                opts.get("github_release", "master"),
                repo_rename=cls.data_folder_name(),
            )
        if "download_url" in opts:
            url = opts["download_url"]
            dest = os.path.join(target, os.path.basename(url))
            if not download_file(url, dest):
                return False
            if dest.endswith((".tar.gz", ".tgz", ".zip")):
                import shutil

                shutil.unpack_archive(dest, target)
                os.remove(dest)
            return True
        return True
