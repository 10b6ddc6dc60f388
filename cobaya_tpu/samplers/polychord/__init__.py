from .polychord import polychord
