"""Alias module: TTTEEE_lite is already python-native here
(reference: cobaya/likelihoods/planck_2018_highl_plik/TTTEEE_lite_native.py)."""

from .TTTEEE_lite import TTTEEE_lite_native

__all__ = ["TTTEEE_lite_native"]
