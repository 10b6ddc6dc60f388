"""PolyChord-compatible entry point for the native nested sampler.

Users of the reference select ``sampler: polychord``
(/root/reference/cobaya/samplers/polychord/polychord.py); here the same name
maps onto the native JAX nested sampler (samplers/nested) with PolyChord's
main options (``nlive``, ``num_repeats``, ``precision_criterion``)
understood directly and the rest of PolyChord's Fortran-specific knobs
accepted but ignored with a notice.
"""

from __future__ import annotations

from ..nested.nested import Nested

_IGNORED = {
    "nprior", "nfail", "do_clustering", "feedback", "posteriors", "equals",
    "cluster_posteriors", "write_resume", "read_resume", "write_stats",
    "write_live", "write_dead", "write_prior", "maximise", "boost_posterior",
    "compression_factor", "synchronous", "base_dir", "file_root", "grade_dims",
    "grade_frac", "nlives", "logzero", "max_ndead", "oversample_power",
    "blocking", "measure_speeds", "callback_function", "path",
}


class polychord(Nested):
    """Nested sampling with PolyChord's option vocabulary."""

    file_base_name = "nested"

    def __init__(self, info_sampler, model, output, name=None,
                 packages_path=None):
        info = dict(info_sampler or {})
        ignored = {}
        for k in list(info):
            if k in _IGNORED and k != "max_ndead":
                ignored[k] = info.pop(k)
        self._ignored_options = ignored
        super().__init__(info, model, output, name=name,
                         packages_path=packages_path)
        if ignored:
            self.mpi_info(
                "PolyChord-specific options not applicable to the native "
                "nested sampler were ignored: %s", sorted(ignored),
            )
