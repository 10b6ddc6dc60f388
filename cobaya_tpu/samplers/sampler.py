"""Sampler base classes and lifecycle.

Capability parity with /root/reference/cobaya/sampler.py: sampler resolution
by name, checkpoint/progress file management, seeded RNG, forced-resume
handling, and ``CovmatSampler`` with the initial-proposal-covariance fallback
chain (explicit array/dict/file -> per-param proposal -> ref-pdf variance ->
prior variance / 4).

TPU-first: a sampler owns one host process driving a batch of device walkers;
the reference's per-MPI-rank ``SeedSequence`` scatter becomes a single seed
from which a numpy Generator (host decisions: schedules, covmat learning) and
a jax PRNG key (device randomness) are derived, making runs exactly
reproducible across chip counts.
"""

from __future__ import annotations

import os
from typing import Any, Mapping, Optional

import numpy as np

from ..models.component import CobayaComponent, get_component_class
from ..models.model import Model
from ..utils import conventions as cv
from ..utils.log import LoggedError
from ..utils.yamlio import yaml_dump_file, yaml_load_file


def get_sampler_name_and_class(info_sampler: Mapping, logger=None):
    if not info_sampler:
        raise LoggedError(logger, "No sampler given!")
    if len(info_sampler) > 1:
        raise LoggedError(logger, "Only one sampler allowed; got %r",
                          list(info_sampler))
    name = list(info_sampler)[0]
    info = info_sampler[name] or {}
    cls = get_component_class(
        name, kind="sampler",
        component_path=info.get("python_path"),
        class_name=info.get("class"),
    )
    return name, cls


def get_sampler(info_sampler: Mapping, model: Model, output=None,
                packages_path: Optional[str] = None):
    from ..io.output import OutputDummy

    name, cls = get_sampler_name_and_class(info_sampler)
    if output is None:
        output = OutputDummy()
    return cls(
        dict(info_sampler[name] or {}), model, output,
        name=name, packages_path=packages_path,
    )


class Sampler(CobayaComponent):
    """Base class of samplers."""

    seed: Optional[int] = None
    version: Optional[str] = None

    _at_resume_prefer_new = ["version"]

    def __init__(self, info_sampler: Mapping, model: Model, output,
                 name: Optional[str] = None, packages_path=None):
        self.model = model
        self.output = output
        self._measured_speeds = None
        super().__init__(
            info_sampler, name=name, packages_path=packages_path,
            initialize=False, standalone=True,
        )
        self._set_rng()
        if output and output.is_resuming() and hasattr(self, "_load_checkpoint"):
            self._load_checkpoint()
        self.initialize()
        self._release_rng_jax()

    # ---- RNG -------------------------------------------------------------------
    def _set_rng(self):
        from ..parallel import state as pstate

        seed = self.seed
        if seed is None:
            # the auto seed is drawn on root and shared, so every process
            # spawns from the same SeedSequence (reference sampler.py's
            # per-rank SeedSequence scatter, mpi-synced)
            seed = pstate.share(
                int.from_bytes(os.urandom(4), "little"), tag="seed"
            )
            self._auto_seed = seed
        else:
            self.mpi_info("Seeded run with seed=%s", seed)
        self._seed_used = int(seed)
        rank, nproc = pstate.process_index(), pstate.process_count()
        if nproc > 1:
            child = np.random.SeedSequence(self._seed_used).spawn(nproc)
            self._rng = np.random.default_rng(child[rank])
        else:
            self._rng = np.random.default_rng(self._seed_used)
        self._jax_key = None
        self._rank = rank

    @property
    def rng(self) -> np.random.Generator:
        return self._rng

    def jax_key(self):
        import jax

        if self._jax_key is None:
            key = jax.random.key(self._seed_used)
            if getattr(self, "_rank", 0):
                key = jax.random.fold_in(key, self._rank)
            self._jax_key = key
        return self._jax_key

    def next_jax_key(self):
        import jax

        key = self.jax_key()
        self._jax_key, out = jax.random.split(key)
        return out

    def _release_rng_jax(self):
        pass

    # ---- lifecycle ----------------------------------------------------------------
    def initialize(self):
        """Set up the sampler (model is available as self.model)."""

    def run(self):
        raise LoggedError(self.log, "run() not implemented.")

    def products(self, combined: bool = False,
                 skip_samples: float = 0, to_getdist: bool = False) -> dict:
        return {}

    def samples(self, **kwargs):
        return self.products(**kwargs).get("sample")

    def info(self) -> dict:
        """Copy of the info used to initialize this sampler, including
        defaults (reference sampler.py:324)."""
        from ..utils.tools import deepcopy_where_possible

        return deepcopy_where_possible(self._input_options)

    @property
    def random_state(self) -> np.random.Generator:
        """Alias of :attr:`rng` (reference sampler.py:245)."""
        return self._rng

    def converge_info_changed(self, old_info, new_info) -> bool:
        """Whether convergence-relevant options differ (sampler.py:357)."""
        return old_info != new_info

    def set_checkpoint_info(self, checkpoint_info: dict):
        """Apply a loaded checkpoint's sampler state (sampler.py:346)."""
        for k, v in checkpoint_info["sampler"][self.get_name()].items():
            setattr(self, k, v)

    @classmethod
    def delete_output_files(cls, output, info=None):
        """Delete this sampler's products under the prefix (sampler.py:401)."""
        from ..parallel import state as pstate

        if output and pstate.is_main_process():
            output.delete_infix_products()

    # ---- checkpointing ---------------------------------------------------------------
    @property
    def checkpoint_filename(self) -> Optional[str]:
        if self.output:
            return self.output.add_suffix(
                self.get_name() + cv.Extension.checkpoint, separator="."
            )
        return None

    @property
    def progress_filename(self) -> Optional[str]:
        if self.output:
            return self.output.add_suffix(
                self.get_name() + cv.Extension.progress, separator="."
            )
        return None

    @property
    def state_filename(self) -> Optional[str]:
        if self.output:
            from ..parallel import state as pstate

            rank_sfx = (f".{pstate.process_index() + 1}"
                        if pstate.more_than_one_process() else "")
            return self.output.add_suffix(
                self.get_name() + rank_sfx + ".state.npz", separator="."
            )
        return None

    def write_checkpoint_info(self, info: dict):
        from ..parallel import state as pstate

        if self.checkpoint_filename and pstate.is_main_process():
            yaml_dump_file(
                self.checkpoint_filename, {"sampler": {self.get_name(): info}}
            )

    def read_checkpoint_info(self) -> Optional[dict]:
        fn = self.checkpoint_filename
        if fn and os.path.exists(fn):
            data = yaml_load_file(fn)
            return (data.get("sampler") or {}).get(self.get_name())
        return None

    # list of regexps of output files this sampler produces (for --force)
    @classmethod
    def output_files_regexps(cls, output, info=None, minimal=False):
        return []

    @classmethod
    def check_force_resume(cls, output, info=None):
        if output and output.force:
            output.delete_infix_products()


class CovmatSampler(Sampler):
    """Sampler with an initial proposal covariance matrix."""

    covmat: Any = None
    covmat_params: Optional[list] = None
    covmat_dirs: Optional[str] = None
    fallback_covmat_scale: float = 4.0

    def initial_proposal_covmat(self, auto_params=None) -> np.ndarray:
        """Initial covmat: explicit/file -> proposal -> ref var -> prior var/4.

        Reference behavior: sampler.py:485-685.
        """
        params = list(self.model.parameterization.sampled_params())
        d = len(params)
        cov = np.full((d, d), np.nan)
        where = {}
        spec = self.covmat
        if isinstance(spec, str) and spec.lower() == "auto":
            auto = self._auto_covmat()
            if auto:
                where = {p: i for i, p in enumerate(auto["params"])
                         if p in params}
                for p, i in where.items():
                    ip = params.index(p)
                    for q, j in where.items():
                        cov[ip, params.index(q)] = auto["covmat"][i, j]
                self.mpi_info(
                    "Selected automatic covmat '%s' (%d matching params).",
                    auto.get("name"), len(where),
                )
            else:
                self.mpi_info("No automatic covmat found; using fallbacks.")
            spec = None
        if isinstance(spec, str):
            cov_loaded, loaded_params = _load_covmat_file(spec)
            where = {p: i for i, p in enumerate(loaded_params) if p in params}
            for p, i in where.items():
                ip = params.index(p)
                for q, j in where.items():
                    cov[ip, params.index(q)] = cov_loaded[i, j]
            self.mpi_info("Loaded covmat for %d params from '%s'",
                          len(where), spec)
        elif isinstance(spec, Mapping):
            cov_params = list(spec.get("params") or [])
            matrix = np.asarray(spec.get("matrix"))
            for p in cov_params:
                if p in params:
                    ip = params.index(p)
                    i = cov_params.index(p)
                    for q in cov_params:
                        if q in params:
                            cov[ip, params.index(q)] = matrix[
                                i, cov_params.index(q)
                            ]
        elif spec is not None and not isinstance(spec, str):
            matrix = np.atleast_2d(np.asarray(spec, dtype=float))
            cov_params = self.covmat_params or params
            if matrix.shape != (len(cov_params), len(cov_params)):
                raise LoggedError(
                    self.log, "Covmat shape %s does not match %d params",
                    matrix.shape, len(cov_params),
                )
            for p in cov_params:
                if p in params:
                    ip = params.index(p)
                    i = cov_params.index(p)
                    for q in cov_params:
                        if q in params:
                            cov[ip, params.index(q)] = matrix[
                                i, cov_params.index(q)
                            ]
        # per-param fallbacks for missing diagonal entries
        missing = [i for i in range(d) if np.isnan(cov[i, i])]
        # provenance for the proposal-learning gate (reference mcmc.py:419-429
        # keeps the "early" R-1 threshold permanently when the covmat was
        # missing or incomplete)
        self.covmat_fallback_params = [params[i] for i in missing]
        if missing:
            proposals = self.model.parameterization.get_sampled_params_proposals()
            ref_vars = self.model.prior.reference_variances()
            prior_bounds = self.model.prior.bounds(confidence=0.6827)
            for i in missing:
                p = params[i]
                cov[i, :] = np.where(np.isnan(cov[i, :]), 0, cov[i, :])
                cov[:, i] = np.where(np.isnan(cov[:, i]), 0, cov[:, i])
                if proposals.get(p):
                    cov[i, i] = proposals[p] ** 2
                elif np.isfinite(ref_vars[i]) and ref_vars[i] > 0:
                    # conditional widths are typically much smaller than the
                    # marginalized ref/prior ones (reference sampler.py:676)
                    cov[i, i] = ref_vars[i] / self.fallback_covmat_scale
                else:
                    width = prior_bounds[i, 1] - prior_bounds[i, 0]
                    if not np.isfinite(width) or width <= 0:
                        raise LoggedError(
                            self.log,
                            "Could not find a fallback proposal width for "
                            "parameter '%s'; give it a 'proposal', a proper "
                            "'ref', or a bounded prior.", p,
                        )
                    cov[i, i] = (width / 2) ** 2 / self.fallback_covmat_scale
        # fill remaining nans (off-diagonal of partially-loaded) with 0
        cov = np.where(np.isnan(cov), 0.0, cov)
        return cov

    def _auto_covmat(self):
        """Covmat lookup: theory hook first, then the covmat library."""
        for theory in getattr(self.model, "theory", {}).values():
            try:
                result = theory.get_auto_covmat(
                    self.model.info().get("params"), self.model.info().get(
                        "likelihood"),
                )
            except Exception:
                result = None
            if result:
                return result
        folder = getattr(self, "covmat_dirs", None) or os.environ.get(
            "COBAYA_TPU_COVMAT_DIR"
        )
        if folder:
            from ..cosmo_input.autoselect_covmat import get_best_covmat

            renames = self.model.parameterization.sampled_params_renames()
            aliases = []
            for like in self.model.likelihood.values():
                aliases += list(getattr(like, "aliases", []) or [])
            return get_best_covmat(renames, aliases, folder)
        return None

    def dump_covmat(self, covmat: np.ndarray):
        from ..parallel import state as pstate

        if not self.output or not pstate.is_main_process():
            return
        fn = self.output.add_suffix(
            self.get_name() + cv.Extension.covmat, separator="."
        )
        header = " ".join(self.model.parameterization.sampled_params())
        np.savetxt(fn, covmat, header=header)

    def load_covmat_checkpoint(self) -> Optional[np.ndarray]:
        if not self.output:
            return None
        fn = self.output.add_suffix(
            self.get_name() + cv.Extension.covmat, separator="."
        )
        if os.path.exists(fn):
            return np.atleast_2d(np.loadtxt(fn))
        return None


class Minimizer(Sampler):
    """Base marker class for minimizers."""


def _load_covmat_file(path: str):
    with open(path, encoding="utf-8") as f:
        header = f.readline()
    params = header.lstrip("#").split()
    return np.atleast_2d(np.loadtxt(path)), params
