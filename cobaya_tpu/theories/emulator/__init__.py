"""Device-resident Boltzmann-surrogate theory (see emulator.py)."""

from .emulator import EmulatorCosmology, emulator  # noqa: F401
