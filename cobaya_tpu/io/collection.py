"""Sample storage: in-memory chain collections and the cobaya txt format.

Capability parity with /root/reference/cobaya/collection.py: fixed column
schema ``weight, minuslogpost, <sampled>, <derived>, minuslogprior
(+ per-prior), chi2 (+ per-likelihood)``; weighted means/covariances over row
ranges; temperature support (tempered weights + detempering); importance
reweighting; skip/thin; best-fit/MAP extraction; fixed-width ``%.8g`` text
output and loading.

TPU-first design: storage is a growable numpy array appended in whole-epoch
batches (the device flushes thinned sample buffers once per epoch), not a
pandas DataFrame written row-by-row.  Consecutive identical points are
run-length-encoded into weights at append time, reproducing the reference's
accepted-point + weight chain format exactly when thin == 1 — which the
MCMC sampler's ``output_format: accepted`` mode guarantees by recording
every step; the default ``thinned`` mode stores snapshot records with
weight = thinning instead.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..utils import conventions as cv
from ..utils.log import HasLogger, LoggedError

# value used by the reference for infinities in chain files
_OUT_FMT = "%17.8g"


def apply_temperature_weights(weights, logpost, temperature):
    """Convert tempered-chain weights to physical-posterior weights.

    ``logpost`` is the TEMPERED log-posterior (the chain samples the full
    posterior to the power 1/T); the detempering factor is
    ``exp((T-1) * logpost_T)`` normalized to max 1 (reference
    collection.py:123-140).
    """
    if temperature == 1:
        return weights
    logp_t = np.asarray(logpost)
    return weights * np.exp((temperature - 1) * (logp_t - logp_t.max()))


class BaseCollection(HasLogger):
    def __init__(self, model=None, name: Optional[str] = None,
                 sampled_params=None, derived_params=None, prior_names=None,
                 like_names=None, temperature: float = 1.0):
        self.name = name
        self.set_logger(name or self.__class__.__name__)
        if model is not None:
            sampled_params = list(model.parameterization.sampled_params())
            derived_params = list(model.parameterization.derived_params())
            prior_names = list(model.prior.names)
            like_names = list(model.likelihood)
        self.sampled_params = list(sampled_params or [])
        self.derived_params = list(derived_params or [])
        self.prior_names = list(prior_names or [])
        self.like_names = list(like_names or [])
        self.temperature = float(temperature)
        self.columns = (
            [cv.OUT_WEIGHT, cv.OUT_MINUSLOGPOST]
            + self.sampled_params
            + self.derived_params
            + [cv.OUT_MINUSLOGPRIOR]
            + [cv.minuslogprior_name(p) for p in self.prior_names]
            + [cv.OUT_CHI2]
            + [cv.chi2_name(like) for like in self.like_names]
        )

    @property
    def n_sampled(self):
        return len(self.sampled_params)


class SampleCollection(BaseCollection):
    """A chain of weighted samples."""

    def __init__(self, model=None, output=None, name: Optional[str] = None,
                 extension: str = "txt", file_name: Optional[str] = None,
                 resuming: bool = False, load: bool = False,
                 temperature: float = 1.0, sampled_params=None,
                 derived_params=None, prior_names=None, like_names=None):
        super().__init__(model=model, name=name,
                         sampled_params=sampled_params,
                         derived_params=derived_params,
                         prior_names=prior_names, like_names=like_names,
                         temperature=temperature)
        self._n = 0
        self._data = np.empty((0, len(self.columns)))
        self._output = output
        self._file_name = file_name
        if output is not None and file_name is None:
            self._file_name = output.prefix_regexp_name(name or "1", extension)
        self._n_flushed = 0
        if (resuming or load) and self._file_name and os.path.exists(
            self._file_name
        ):
            self._load_file(self._file_name)
            self._n_flushed = self._n

    # ---- column indexing ---------------------------------------------------
    def _icol(self, col: str) -> int:
        try:
            return self.columns.index(col)
        except ValueError as exc:
            raise LoggedError(self.log, "Unknown column '%s'", col) from exc

    def __len__(self):
        return self._n

    def n(self):
        return self._n

    @property
    def data(self) -> np.ndarray:
        return self._data[: self._n]

    def __getitem__(self, col):
        if isinstance(col, str):
            return self.data[:, self._icol(col)]
        raise LoggedError(self.log, "Index collections by column name.")

    @property
    def weights(self) -> np.ndarray:
        return self.data[:, 0]

    @property
    def is_tempered(self) -> bool:
        """Whether the sample was drawn at temperature != 1
        (reference collection.py:673)."""
        return self.temperature != 1

    @property
    def has_int_weights(self) -> bool:
        """Whether all weights are integer (reference collection.py:681)."""
        weights = self.weights
        return bool(np.allclose(np.round(weights), weights))

    @property
    def n_last_out(self) -> int:
        """Index of the last row flushed to the chain file
        (reference collection.py:794)."""
        return self._n_flushed

    def reset(self):
        """Drop all rows (the chain file restarts on the next flush);
        reference collection.py:395."""
        self._n = 0
        self._n_flushed = 0

    def to_numpy(self, dtype=None, copy: bool = False) -> np.ndarray:
        """The sample as a (n, len(columns)) array (collection.py:686)."""
        out = self.data
        if copy or dtype is not None:
            out = np.array(out, dtype=dtype)
        return out

    def __repr__(self):
        return (f"SampleCollection({self.name or ''}, {self._n} rows x "
                f"{len(self.columns)} cols)")

    # ---- appending -----------------------------------------------------------
    def _ensure_capacity(self, extra: int):
        need = self._n + extra
        if need > len(self._data):
            new_size = max(need, 2 * len(self._data), 1024)
            grown = np.empty((new_size, len(self.columns)))
            grown[: self._n] = self._data[: self._n]
            self._data = grown

    def add(self, values, derived=None, weight: float = 1.0,
            logpriors=None, loglikes=None, logpost=None):
        """Add a single point (reference OnePoint-style)."""
        logpriors = np.atleast_1d(
            logpriors if logpriors is not None
            else np.zeros(len(self.prior_names))
        )
        loglikes = np.atleast_1d(loglikes if loglikes is not None else [])
        if logpost is None:
            logpost = float(np.sum(logpriors) + np.sum(loglikes))
        row = np.concatenate([
            [weight, -logpost],
            np.atleast_1d(values),
            np.atleast_1d(derived if derived is not None else
                          np.empty(len(self.derived_params)) * np.nan),
            [-np.sum(logpriors)], -np.asarray(logpriors),
            [-2 * np.sum(loglikes)], -2 * np.asarray(loglikes),
        ])
        self.append_rows(row[None, :])

    def append_rows(self, rows: np.ndarray):
        rows = np.atleast_2d(rows)
        if rows.shape[1] != len(self.columns):
            raise LoggedError(
                self.log, "Row width %d != %d columns", rows.shape[1],
                len(self.columns),
            )
        self._ensure_capacity(len(rows))
        self._data[self._n: self._n + len(rows)] = rows
        self._n += len(rows)

    def append_batch(self, x, logpost, logpriors, loglikes, derived,
                     weights=None, rle: bool = True):
        """Append an epoch batch for one chain, with optional run-length
        encoding of consecutive repeated points into weights.

        x: (n, d); logpost: (n,); logpriors: (n, np); loglikes: (n, nl);
        derived: (n, nder); weights: (n,) or None.
        """
        n = len(x)
        if n == 0:
            return
        weights = np.ones(n) if weights is None else np.asarray(weights, float)
        rows = np.empty((n, len(self.columns)))
        rows[:, 0] = weights
        rows[:, 1] = -np.asarray(logpost)
        i0 = 2
        rows[:, i0:i0 + len(self.sampled_params)] = x
        i0 += len(self.sampled_params)
        nd = len(self.derived_params)
        rows[:, i0:i0 + nd] = (
            derived if nd else np.empty((n, 0))
        )
        i0 += nd
        rows[:, i0] = -np.sum(logpriors, axis=-1)
        i0 += 1
        npri = len(self.prior_names)
        rows[:, i0:i0 + npri] = -np.asarray(logpriors)
        i0 += npri
        rows[:, i0] = -2 * np.sum(loglikes, axis=-1)
        i0 += 1
        rows[:, i0:] = -2 * np.asarray(loglikes)
        if rle and n > 1:
            # collapse consecutive identical points (same sampled values)
            xs = rows[:, 2:2 + len(self.sampled_params)]
            same = np.all(xs[1:] == xs[:-1], axis=1)
            keep = np.concatenate([[True], ~same])
            idx = np.flatnonzero(keep)
            counts = np.diff(np.append(idx, n))
            rows = rows[idx]
            rows[:, 0] = rows[:, 0] * 0 + counts * weights[idx]
        if rle and self._n > self._n_flushed and len(rows):
            # merge across append boundaries: a rejection streak spanning
            # two epochs must still be one row (reference repeat-weights);
            # only possible while the newest row is not yet on disk
            sl = slice(2, 2 + len(self.sampled_params))
            if np.array_equal(rows[0, sl], self.data[self._n - 1, sl]):
                self.data[self._n - 1, 0] += rows[0, 0]
                rows = rows[1:]
        self.append_rows(rows)

    # ---- statistics ------------------------------------------------------------
    def _range(self, first=None, last=None):
        first = 0 if first is None else (
            int(first * self._n) if isinstance(first, float) and first < 1
            else int(first)
        )
        last = self._n if last is None else int(last)
        return slice(first, last)

    def _detempered_weights(self, sl, shift=None) -> np.ndarray:
        w = self.data[sl, 0]
        if self.temperature == 1:
            return w
        # the chain samples p^(1/T) of the FULL posterior; true-posterior
        # importance weights are p^(1-1/T) = exp((T-1)*logpost_T) up to
        # normalization (reference collection.py:123-140, 688-732).
        # ``shift`` lets a batch of chains share one normalization point.
        logpost_t = -self.data[sl, 1]  # tempered logpost, p^(1/T)
        if shift is None:
            shift = logpost_t.max()
        return w * np.exp((self.temperature - 1) * (logpost_t - shift))

    def _stat_weights(self, sl, weights, tempered):
        if weights is not None:
            return np.asarray(weights)
        if tempered:
            return self.data[sl, 0]  # raw weights of the tempered sample
        return self._detempered_weights(sl)

    def mean(self, first=None, last=None, weights=None,
             derived: bool = False, tempered: bool = False) -> np.ndarray:
        """Weighted parameter means (reference collection.py:893):
        ``weights`` overrides; ``tempered`` uses the raw tempered-sample
        weights instead of detempering."""
        sl = self._range(first, last)
        w = self._stat_weights(sl, weights, tempered)
        cols = self._param_block(derived)
        return np.average(self.data[sl, cols[0]:cols[1]], weights=w, axis=0)

    def cov(self, first=None, last=None, weights=None,
            derived: bool = False, tempered: bool = False) -> np.ndarray:
        sl = self._range(first, last)
        w = self._stat_weights(sl, weights, tempered)
        cols = self._param_block(derived)
        vals = self.data[sl, cols[0]:cols[1]]
        mu = np.average(vals, weights=w, axis=0)
        dx = vals - mu
        # frequency weights (integer repeat counts): ddof uses sum(w) - 1
        wsum = w.sum()
        denom = max(wsum - 1.0, 1.0)
        return np.einsum("n,ni,nj->ij", w, dx, dx) / denom

    def _param_block(self, derived: bool):
        start = 2
        end = start + len(self.sampled_params)
        if derived:
            end += len(self.derived_params)
        return (start, end)

    def bestfit(self) -> np.ndarray:
        """Row with the maximum likelihood (min chi2)."""
        i = np.argmin(self.data[:, self._icol(cv.OUT_CHI2)])
        return self.data[i]

    def MAP(self) -> np.ndarray:
        i = np.argmin(self.data[:, 1])
        return self.data[i]

    def sampled_values(self) -> np.ndarray:
        return self.data[:, 2:2 + len(self.sampled_params)]

    # ---- transformations ---------------------------------------------------------
    def detempered_copy(self) -> "SampleCollection":
        out = self._empty_like(temperature=1.0)
        rows = self.data.copy()
        rows[:, 0] = self._detempered_weights(slice(0, self._n))
        if self.temperature != 1:
            rows[:, 1] *= self.temperature  # -logpost_T -> -logpost
        out.append_rows(rows)
        return out

    def reset_temperature(self, with_batch=None):
        """In-place detempering (reference collection.py:741-764).

        Pass sibling chains of the same run as ``with_batch`` so all share
        one weight normalization (they are detempered in place too).
        """
        batch = [self] + list(with_batch or [])
        if all(c.temperature == 1 for c in batch):
            return self
        temps = {c.temperature for c in batch}
        if len(temps) > 1:
            raise LoggedError(
                self.log, "Temperature inconsistent across the batch: %r",
                sorted(temps),
            )
        if not any(c._n for c in batch):  # nothing to reweight
            for c in batch:
                c.temperature = 1.0
            return self
        shift = max(float((-c.data[: c._n, 1]).max()) for c in batch
                    if c._n)
        for c in batch:
            c._data[: c._n, 0] = c._detempered_weights(
                slice(0, c._n), shift=shift
            )
            c._data[: c._n, 1] *= c.temperature
            c.temperature = 1.0
        return self

    def reweight(self, importance_weights, inplace: bool = False):
        target = self if inplace else self._copy()
        target._data[: target._n, 0] = (
            target.data[:, 0] * np.asarray(importance_weights)
        )
        mask = target.data[:, 0] > 0
        target._data[: mask.sum()] = target.data[mask]
        target._n = int(mask.sum())
        # rows already on disk no longer match memory: rewrite from scratch
        # on the next flush instead of appending past a stale offset
        target._n_flushed = 0
        return target

    def skip_samples(self, skip, inplace: bool = False):
        """Drop the first ``skip`` rows (or fraction if < 1)."""
        n_skip = int(skip * self._n) if 0 < skip < 1 else int(skip)
        target = self if inplace else self._copy()
        target._data = target._data[n_skip:]
        target._n -= n_skip
        target._n_flushed = max(0, target._n_flushed - n_skip)
        return target

    def thin_samples(self, thin: int, inplace: bool = False):
        """Keep unit-weight thinned samples (reference collection.py:1074)."""
        if thin == 1:
            return self if inplace else self._copy()
        w = self.data[:, 0]
        if not np.allclose(w, np.round(w)):
            raise LoggedError(
                self.log, "Cannot thin samples with non-integer weights."
            )
        # expand weights, take every thin-th unit sample
        idx = np.repeat(np.arange(self._n), np.round(w).astype(int))[::thin]
        uniq, counts = np.unique(idx, return_counts=True)
        rows = self.data[uniq].copy()
        rows[:, 0] = counts
        target = self if inplace else self._copy()
        target._data = rows
        target._n = len(rows)
        target._n_flushed = 0
        return target

    def filtered_copy(self, where) -> "SampleCollection":
        out = self._empty_like()
        out.append_rows(self.data[where])
        return out

    def copy(self) -> "SampleCollection":
        return self._copy()

    def _copy(self) -> "SampleCollection":
        out = self._empty_like()
        out.append_rows(self.data.copy())
        return out

    def _empty_like(self, temperature=None) -> "SampleCollection":
        return SampleCollection(
            name=self.name, sampled_params=self.sampled_params,
            derived_params=self.derived_params, prior_names=self.prior_names,
            like_names=self.like_names,
            temperature=self.temperature if temperature is None
            else temperature,
        )

    # ---- disk I/O -------------------------------------------------------------
    def _header(self) -> str:
        return "#" + " ".join(f"{c:>17s}" if i else f"{c:>16s}"
                              for i, c in enumerate(self.columns)) + "\n"

    def format_rows(self, rows: np.ndarray) -> str:
        # native C++ formatter when available (io/_fastio.cpp), else Python
        from . import native

        text = native.format_rows(np.atleast_2d(rows))
        if text is not None:
            return text
        lines = []
        for row in np.atleast_2d(rows):
            lines.append(" ".join(_OUT_FMT % v for v in row))
        return "\n".join(lines) + ("\n" if len(lines) else "")

    def out_update(self, final: bool = True):
        """Flush new rows to the chain file (append-only).

        With ``final=False`` (incremental per-epoch flushing) the newest
        row is held back: the next epoch's append may still merge into it
        (cross-boundary repeat-weight run-length encoding).
        """
        if not self._file_name:
            return
        upto = self._n if final else max(self._n - 1, self._n_flushed)
        new = self.data[self._n_flushed:upto]
        if not len(new):
            return
        mode = "a" if self._n_flushed else "w"
        with open(self._file_name, mode, encoding="utf-8") as f:
            if mode == "w":
                f.write(self._header())
            f.write(self.format_rows(new))
        self._n_flushed = upto

    def _load_file(self, file_name: str):
        from ..utils.tools import truncate_to_end_line

        truncate_to_end_line(file_name)
        with open(file_name, encoding="utf-8") as f:
            header = f.readline()
        names = header.lstrip("#").split()
        data = np.loadtxt(file_name, ndmin=2)
        if data.size == 0:
            return
        if names != self.columns:
            raise LoggedError(
                self.log,
                "Chain file columns %s do not match expected %s",
                names, self.columns,
            )
        self._check_consistency(data, file_name)
        self.append_rows(data)

    def _check_consistency(self, rows: np.ndarray, file_name: str):
        """Loaded-chain sanity: logpost == logprior + loglike (T=1) and
        positive weights (reference collection.py:335-376)."""
        if not len(rows):
            return
        if np.any(rows[:, 0] < 0):
            raise LoggedError(
                self.log, "Negative weights in chain file '%s'.", file_name
            )
        mlp = rows[:, self._icol(cv.OUT_MINUSLOGPOST)]
        mlprior = rows[:, self._icol(cv.OUT_MINUSLOGPRIOR)]
        chi2 = rows[:, self._icol(cv.OUT_CHI2)]
        # full-posterior tempering: logpost_T = (logprior + loglike)/T
        # (reference collection.py:102-120 infers T from this ratio)
        expected = (mlprior + chi2 / 2) / self.temperature
        finite = np.isfinite(mlp) & np.isfinite(expected)
        if finite.any() and not np.allclose(
            mlp[finite], expected[finite], rtol=1e-4, atol=1e-3
        ):
            self.mpi_warning(
                "Loaded chain '%s' has inconsistent minuslogpost vs "
                "minuslogprior + chi2/2 (max diff %.3g); check its "
                "temperature or provenance.", file_name,
                float(np.max(np.abs(mlp[finite] - expected[finite]))),
            )

    @classmethod
    def load(cls, file_name: str, name=None,
             temperature: float = 1.0) -> "SampleCollection":
        """Load a chain txt file, inferring the column roles from the header."""
        with open(file_name, encoding="utf-8") as f:
            header = f.readline()
        names = header.lstrip("#").split()
        iw = names.index(cv.OUT_WEIGHT)
        imlp = names.index(cv.OUT_MINUSLOGPOST)
        imlprior = names.index(cv.OUT_MINUSLOGPRIOR)
        ichi2 = names.index(cv.OUT_CHI2)
        sampled_and_derived = names[imlp + 1:imlprior]
        prior_names = [
            n[len(cv.OUT_MINUSLOGPRIOR + cv.SEPARATOR):]
            for n in names[imlprior + 1:ichi2]
        ]
        like_names = [cv.undo_chi2_name(n) for n in names[ichi2 + 1:]]
        # sampled vs derived split is not recorded in the file: treat all as
        # sampled (callers with a model use the model-aware constructor)
        out = cls(
            name=name, sampled_params=sampled_and_derived, derived_params=[],
            prior_names=prior_names, like_names=like_names,
            temperature=temperature,
        )
        out._load_file(file_name)
        return out

    def get_stats(self, params=None, cl_levels=(0.68, 0.95)) -> dict:
        """Marginal statistics per parameter: mean, std, CL bounds.

        Weighted quantiles replace the reference's getdist dependency for
        basic analysis; ``to_getdist()`` remains for full getdist workflows.
        """
        from ..ops.convergence import weighted_quantile

        names = params or (self.sampled_params + self.derived_params)
        w = self._detempered_weights(slice(0, self._n))
        stats = {}
        for p in names:
            v = self[p]
            mu = float(np.average(v, weights=w))
            sd = float(np.sqrt(np.average((v - mu) ** 2, weights=w)))
            entry = {"mean": mu, "std": sd}
            for cl in cl_levels:
                lo, hi = weighted_quantile(
                    v, [(1 - cl) / 2, 1 - (1 - cl) / 2], w
                )
                entry[f"cl{int(round(cl * 100))}"] = (float(lo), float(hi))
            stats[p] = entry
        return stats

    def to_pandas(self):
        """Export as a pandas DataFrame (optional dependency)."""
        import pandas as pd

        return pd.DataFrame(self.data.copy(), columns=self.columns)

    def to_getdist(self, label=None):
        """Export as a getdist MCSamples (optional dependency)."""
        try:
            from getdist import MCSamples
        except ImportError as exc:
            raise LoggedError(
                self.log, "getdist is not installed: %s", exc
            ) from exc
        names = self.sampled_params + self.derived_params
        i0 = 2
        return MCSamples(
            samples=self.data[:, i0:i0 + len(names)],
            weights=self._detempered_weights(slice(0, self._n)),
            # detempered -logpost: the stored column is the tempered value
            loglikes=self.data[:, 1] * self.temperature,
            names=names,
        )


class OneSamplePoint:
    """Lightweight current-point holder (reference collection.py:1334)."""

    def __init__(self, model, output_thin: int = 1):
        self.sampled_params = list(model.parameterization.sampled_params())
        self.output_thin = output_thin
        self._thin_count = 0
        self.values = None
        self.weight = 0
        self.results = None

    def add(self, values, results):
        self.values = np.asarray(values)
        self.results = results
        self.weight = 1

    def increase_weight(self, by: float = 1):
        self.weight += by

    def add_to_collection(self, collection: SampleCollection) -> bool:
        self._thin_count += self.weight
        if self._thin_count < self.output_thin:
            return False
        weight, self._thin_count = divmod(self._thin_count, self.output_thin)
        collection.add(
            self.values, derived=self.results.derived, weight=weight,
            logpriors=self.results.logpriors, loglikes=self.results.loglikes,
            logpost=self.results.logpost,
        )
        return True
