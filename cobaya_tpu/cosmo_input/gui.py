"""Graphical input generator (cosmo run composer).

The reference provides a PySide6 GUI
(/root/reference/cobaya/cosmo_input/gui.py); this environment ships no Qt,
so the graphical frontend is not available here.  ``gui_script`` degrades to
an interactive text prompt over the same preset database, producing the same
inputs as :func:`cosmo_input.create_input`.
"""

from __future__ import annotations

import sys

from ..utils.yamlio import yaml_dump
from . import input_database
from .create_input import create_input


def gui_script(args=None):
    try:
        import PySide6  # noqa: F401

        print(
            "PySide6 found, but the graphical composer has not been ported "
            "yet; falling back to the text prompt."
        )
    except ImportError:
        pass
    print("Available presets:")
    presets = {k: v for k, v in input_database.preset.items()
               if k != input_database.none}
    for i, (name, spec) in enumerate(presets.items()):
        print(f"  [{i}] {name}: {spec.get('desc', '')}")
    choice = input("Pick a preset number (or empty to abort): ").strip()
    if not choice:
        return None
    name = list(presets)[int(choice)]
    info = create_input(preset=name)
    text = yaml_dump(info)
    print("\n" + text)
    out = input("Save to file (empty to skip): ").strip()
    if out:
        with open(out, "w", encoding="utf-8") as f:
            f.write(text)
        print(f"Saved to {out}")
    return info


if __name__ == "__main__":
    gui_script(sys.argv[1:])
