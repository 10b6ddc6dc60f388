"""Automatic proposal-covariance selection from a covmat library.

Capability parity with
/root/reference/cobaya/cosmo_input/autoselect_covmat.py:117-250: a cached
database of ``.covmat`` files keyed by the parameter / data tags parsed
from their file names, and a ranked selection cascade over the model's
sampled parameters (with renames) and likelihoods (with aliases):

1. most parameters shared with the model (param names + renames);
2. most likelihood names/aliases matched in the file name (delimited);
3. (grid jobs) fewest parameters in the covmat that the model lacks;
4. fewest covmat parameters (prefer the simplest model);
5. fewest data tags in the name (prefer the simplest data combination).

Grid jobs can also hit exact tag-key matches first, including ``without``
(tags to drop) and ``rename`` maps, as the reference's batch pipeline does.
The database is cached on disk (pickle keyed by a folder-list hash) and in
memory.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import re
from itertools import chain
from typing import NamedTuple, Optional

import numpy as np

from ..utils.log import get_logger
from ..utils.tools import str_to_list

log = get_logger("autoselect_covmat")

_COVMATS_FILE = "covmat_%s.pkl"

# default library locations under an installed packages path
covmat_folders = [
    "{packages_path}/data/planck_supp_data_and_covmats/covmats/",
    "{packages_path}/data/bicep_keck_2018/BK18_cosmomc/planck_covmats/",
]


class CovmatFileKey(NamedTuple):
    paramtags: frozenset
    datatags: frozenset
    base: str


def covmat_file_key(paramtags, datatags, base) -> CovmatFileKey:
    return CovmatFileKey(frozenset(paramtags), frozenset(datatags), base)


_loaded_databases: dict[str, dict[CovmatFileKey, dict]] = {}


def get_cache_path() -> str:
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    path = os.path.join(base, "cobaya_tpu")
    os.makedirs(path, exist_ok=True)
    return path


def get_covmat_package_folders(packages_path: str) -> list[str]:
    out = []
    for folder in covmat_folders:
        full = folder.format(packages_path=packages_path).replace(
            "/", os.sep)
        if os.path.exists(full):
            out.append(full)
    return out


def get_covmat_database(installed_folders,
                        cached: bool = True) -> dict[CovmatFileKey, dict]:
    """{tag-key: {folder, name, params}} over every .covmat in the folders.

    File-name convention (CosmoMC/reference): ``base_tag1_tag2_....covmat``
    where tags that appear in the header's parameter list are param tags
    and the rest are data tags.
    """
    installed_folders = [f for f in map(str, installed_folders)
                         if os.path.isdir(f)]
    _hash = hashlib.md5(str(installed_folders).encode("utf8")).hexdigest()
    cache_file = os.path.join(get_cache_path(), _COVMATS_FILE % _hash)
    if cached:
        if _hash in _loaded_databases:
            return _loaded_databases[_hash]
        try:
            mtime = max((os.path.getmtime(f) for f in installed_folders),
                        default=0)
            if os.path.getmtime(cache_file) >= mtime:
                with open(cache_file, "rb") as f:
                    db = pickle.load(f)
                _loaded_databases[_hash] = db
                return db
        except (OSError, pickle.PickleError):
            pass
    db: dict[CovmatFileKey, dict] = {}
    for folder in installed_folders:
        for filename in sorted(os.listdir(folder)):
            if not filename.endswith(".covmat"):
                continue
            try:
                with open(os.path.join(folder, filename),
                          encoding="utf-8-sig") as f:
                    header = f.readline()
            except OSError:
                continue
            if not header.startswith("#"):
                continue
            params = header.lstrip("#").split()
            name = os.path.splitext(filename)[0]
            tags = name.replace(".post.", "_").replace("_post", "").split(
                "_")
            partags = set(tags).intersection(params)
            datatags = set(tags[1:]) - partags
            db[covmat_file_key(partags, datatags, tags[0])] = {
                "folder": folder, "name": filename, "params": params,
            }
    if cached:
        try:
            with open(cache_file, "wb") as f:
                pickle.dump(db, f)
        except OSError:
            pass
        _loaded_databases[_hash] = db
    return db


def _get_best_score(covmats: dict, score_func, min_score=None) -> dict:
    if not covmats:
        return {}
    scores = np.array([score_func(k, v) for k, v in covmats.items()])
    if min_score is not None and np.max(scores) <= min_score:
        return {}
    top = np.max(scores)
    return {k: v for (k, v), s in zip(covmats.items(), scores)
            if s == top}


def get_best_covmat_ext(covmat_dirs, params_info, likelihoods_info,
                        cached: bool = True, job_item=None,
                        cov_map: Optional[dict] = None) -> Optional[dict]:
    """Ranked covmat selection (see module docstring); returns
    {folder, name, params} or None."""
    cov_map = cov_map or {}
    db = get_covmat_database(covmat_dirs, cached=cached)
    if not db:
        log.warning("No covariance matrices found at %s", covmat_dirs)
        return None
    key_tuple = None
    if job_item is not None:
        key_tuple = covmat_file_key(
            job_item.param_set, job_item.data_set.names, job_item.base)
        if (match := db.get(key_tuple)) is not None:
            return dict(match)
        for tup, item in db.items():
            if tup[:2] == key_tuple[:2]:
                return dict(item)
        keys = {key_tuple}
        for remove in cov_map.get("without") or []:
            for param, data, base in keys.copy():
                key = covmat_file_key(set(param) - {remove},
                                      set(data) - {remove}, base)
                if (match := db.get(key)) is not None:
                    return dict(match)
                keys.add(key)
        if rename := cov_map.get("rename"):
            renames = {x: (v,) if isinstance(v, str) else v
                       for x, v in rename.items()}
            for param, data, base in keys.copy():
                key = covmat_file_key(
                    chain(*[renames.get(p, [p]) for p in param]),
                    chain(*[renames.get(p, [p]) for p in data]),
                    rename.get(base, base))
                if (match := db.get(key)) is not None:
                    return dict(match)
                keys.add(key)
        key_tuple = covmat_file_key(
            chain(*[k.paramtags for k in keys]),
            chain(*[k.datatags for k in keys]), key_tuple.base)

    params_renames = set(chain(*[
        [p] + str_to_list((info or {}).get("renames", []) or [])
        for p, info in params_info.items()
    ]))
    likes_renames = set(chain(*[
        [like] + str_to_list((info or {}).get("aliases", []) or [])
        for like, info in (likelihoods_info or {}).items()
    ]))
    delim = r"[_\.]"
    likes_regexps = [re.compile(delim + re.escape(like) + delim)
                     for like in likes_renames]

    def score_params(_key, covmat):
        return len(set(covmat["params"]).intersection(params_renames))

    best_p = _get_best_score(db, score_params, 0)
    if not best_p:
        log.warning("No covariance matrix found including at least one of "
                    "the given parameters")
        return None

    def score_likes(key, covmat):
        if key_tuple:
            return len(key.datatags.intersection(
                likes_renames.union(key_tuple.datatags)))
        return len([0 for r in likes_regexps
                    if r.search(covmat["name"])])

    best = _get_best_score(best_p, score_likes)
    if key_tuple:
        best = _get_best_score(
            best, lambda key, _c: -len(
                key.paramtags - params_renames.union(key_tuple.paramtags)))
    best = _get_best_score(best, lambda _k, c: -len(c["params"]))
    best = _get_best_score(best, lambda key, _c: -len(key.datatags))
    if len(best) > 1:
        log.warning("Using first of >1 possible best covmats: %r",
                    [b["name"] for b in best.values()])
    return dict(next(iter(best.values())))


def get_best_covmat(params_info, likelihoods_info=None, covmats_folder=None,
                    packages_path: Optional[str] = None,
                    cached: bool = True) -> Optional[dict]:
    """Best-matching covmat: {'name', 'params', 'covmat', 'folder'} or None.

    ``params_info`` may be a full sampled-params info dict (name ->
    {renames: ...}) or a mapping name -> renames list (legacy form used by
    the samplers' "covmat: auto" path).
    """
    folders = list(str_to_list(covmats_folder or []) or [])
    if packages_path:
        folders += get_covmat_package_folders(packages_path)
    if not folders:
        return None
    def _norm(info):
        # full params dicts mix sampled-param dicts with fixed values
        # (floats/strings/lambdas) and rename lists; only dicts carry
        # renames worth matching
        if isinstance(info, dict):
            return dict(info)
        if isinstance(info, (list, tuple, set)):
            return {"renames": list(info)}
        return {}

    norm_params = {
        p: _norm(info) for p, info in (params_info or {}).items()
    }
    if isinstance(likelihoods_info, (list, tuple, set)):
        likelihoods_info = {like: {} for like in likelihoods_info}
    data = get_best_covmat_ext(folders, norm_params, likelihoods_info or {},
                               cached=cached)
    if not data:
        return None
    covmat = np.atleast_2d(np.loadtxt(
        os.path.join(data["folder"], data["name"])))
    data["covmat"] = covmat
    log.info("Selected covmat '%s' (%d params).", data["name"],
             len(data["params"]))
    return data
