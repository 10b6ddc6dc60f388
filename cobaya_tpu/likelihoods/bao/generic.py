"""Generic BAO likelihood configured entirely from the input
(reference: cobaya/likelihoods/bao/generic.py)."""

from ..base_classes.bao import BAO


class generic(BAO):
    """User-configured BAO measurements."""
