from .camb import CAMB
