"""Alias module: TT_lite is already python-native here
(reference: cobaya/likelihoods/planck_2018_highl_plik/TT_lite_native.py)."""

from .TT_lite import TT_lite_native

__all__ = ["TT_lite_native"]
