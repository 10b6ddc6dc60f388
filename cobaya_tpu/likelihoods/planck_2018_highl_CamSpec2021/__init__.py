"""Planck 2018 high-l CamSpec 12.6HMcl likelihoods (Efstathiou &
Gratton 2019), python-native.

Reference: cobaya/likelihoods/planck_2018_highl_CamSpec2021/.
"""
