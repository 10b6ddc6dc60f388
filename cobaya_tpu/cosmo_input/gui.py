"""Graphical input generator (cosmo run composer).

Capability parity with /root/reference/cobaya/cosmo_input/gui.py (450 LoC):
a Qt window with one combo box per model/data field, preset selection that
fills every combo, display tabs for the YAML input / equivalent Python
dict / bibliography / auto-selected covariance matrix (correlation-colored
table), per-tab save and copy-to-clipboard with matching file suffixes, and
a menu showing any component's defaults + bibliography in a dialog
(reference ``DefaultsDialog``, gui.py:374-420).

TPU-native design note: everything that *computes* (preset expansion, YAML
and Python rendering, bibliography collection, covmat ranking) lives in the
headless :class:`Composer` backend so it is unit-testable without a Qt
binding; the Qt layer is a thin view.  Works with PySide6, PySide2, or
PyQt5 — whichever is importable; without any Qt binding ``gui_script``
degrades to an interactive text prompt over the same preset database,
producing identical inputs via :func:`cosmo_input.create_input`.
"""

from __future__ import annotations

import io
import sys
from pprint import pformat

import numpy as np

from ..utils.yamlio import yaml_dump
from . import input_database
from .create_input import _FIELD_ORDER, _LIKE_FIELDS, create_input

_ALL_FIELDS = ["theory"] + _FIELD_ORDER + _LIKE_FIELDS + ["sampler"]

TAB_SUFFIXES = {"yaml": ".yaml", "python": ".py", "bibliography": ".txt",
                "covmat": ".covmat"}
TAB_FILTERS = {"yaml": "Yaml files (*.yaml *.yml)", "python": "(*.py)",
               "bibliography": "(*.txt)", "covmat": "(*.covmat)"}


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


def component_defaults_texts(component: str, kind: str | None = None) -> dict:
    """yaml / python / bibliography texts for one component's defaults
    (backend of the reference's DefaultsDialog, gui.py:374-420)."""
    from ..bib import get_bib_component
    from ..doc import doc

    defaults = doc(component, kind=kind, return_yaml=False)
    wrapped = {kind or "component": {component: defaults}}
    return {
        "yaml": yaml_dump(wrapped),
        "python": pformat(wrapped),
        "bibliography": get_bib_component(component, kind),
    }


class Composer:
    """Headless composer backend shared by the Qt window and the prompt."""

    def __init__(self, packages_path: str | None = None):
        self.choices = {f: input_database.none for f in _ALL_FIELDS}
        self.choices["theory"] = "camb"
        self.packages_path = packages_path

    def set_preset(self, name: str):
        spec = dict(input_database.preset[name])
        spec.pop("desc", None)
        for f in _ALL_FIELDS:
            self.choices[f] = spec.get(
                f, "camb" if f == "theory" else input_database.none
            )

    def info(self, get_comments: bool = False) -> dict:
        kwargs = {
            f: v for f, v in self.choices.items()
            if v not in (input_database.none, None)
        }
        return create_input(get_comments=get_comments, **kwargs)

    # ---- display tabs -----------------------------------------------------
    @staticmethod
    def _comments_text(info: dict) -> str:
        comments = info.pop("comment", None)
        if not comments:
            return ""
        return "\n# " + "\n# ".join(comments)

    def yaml_text(self) -> str:
        try:
            info = self.info(get_comments=True)
        except Exception as exc:  # incompatible combination picked
            return f"# invalid combination: {exc}\n"
        comments = self._comments_text(info)
        return yaml_dump(info) + comments

    def python_text(self) -> str:
        try:
            info = self.info(get_comments=True)
        except Exception as exc:
            return f"# invalid combination: {exc}\n"
        comments = self._comments_text(info)
        return "info = " + pformat(info) + comments

    def bib_text(self) -> str:
        from ..bib import get_bib_info

        try:
            info = self.info()
        except Exception as exc:
            return f"% invalid combination: {exc}\n"
        blocks = get_bib_info(info)
        return "\n".join(
            f"% ===== {name} =====\n{bib}" for name, bib in blocks.items()
        )

    # ---- covmat tab (reference gui.py:267-319) ----------------------------
    def covmat_data(self) -> dict | None:
        """Auto-selected covmat {'name','params','covmat'} or None."""
        from .autoselect_covmat import get_best_covmat

        if not self.packages_path:
            return None
        try:
            info = self.info()
        except Exception:
            return None
        return get_best_covmat(
            info.get("params", {}), info.get("likelihood", {}),
            packages_path=self.packages_path,
        )

    def covmat_text(self) -> str:
        if not self.packages_path:
            return ("Use --packages-path (or the config file's packages "
                    "path) to autoselect a covariance matrix for this input.")
        data = self.covmat_data()
        if not data:
            return ("No appropriate covariance matrix found for this input "
                    "in the packaged covmat database.")
        return (f"Covariance file: '{data['name']}'\n\nIn a sampler block, "
                "the 'covmat: auto' option selects it automatically.")

    def covmat_txt(self) -> str:
        """The selected covmat in cobaya .covmat format (text)."""
        data = self.covmat_data()
        if not data:
            return ""
        buf = io.BytesIO()
        np.savetxt(buf, data["covmat"], header=" ".join(data["params"]))
        return buf.getvalue().decode()

    def tab_text(self, tab: str) -> str:
        return {"yaml": self.yaml_text, "python": self.python_text,
                "bibliography": self.bib_text, "covmat": self.covmat_txt,
                }[tab]()


def _corr_colors(covmat: np.ndarray):
    """(corrmat, RGB triples per cell) via the coolwarm_r colormap."""
    std = np.sqrt(np.diag(covmat))
    corr = covmat / np.outer(std, std)
    try:
        from matplotlib import colormaps

        cmap = colormaps["coolwarm_r"]
    except Exception:
        return corr, None
    colors = [
        [
            [255.99] * 3 if i == j
            else [256 * c for c in cmap(corr[i, j] / 2 + 0.5)[:3]]
            for j in range(len(std))
        ]
        for i in range(len(std))
    ]
    return corr, colors


def _run_qt_gui(qt_widgets, packages_path=None) -> int:
    """Build and run the Qt composer window."""
    Q = qt_widgets

    app = Q.QApplication.instance() or Q.QApplication(sys.argv[:1])
    window = Q.QMainWindow()
    window.setWindowTitle("cobaya_tpu input generator")
    central = Q.QWidget()
    window.setCentralWidget(central)
    layout = Q.QHBoxLayout(central)
    form_box = Q.QVBoxLayout()
    layout.addLayout(form_box, 1)

    composer = Composer(packages_path=packages_path)
    combos: dict = {}
    tabs = Q.QTabWidget()
    displays: dict = {}
    for k in ("yaml", "python", "bibliography"):
        w = Q.QPlainTextEdit()
        w.setReadOnly(True)
        displays[k] = w
        tabs.addTab(w, k)
    covmat_widget = Q.QWidget()
    covmat_layout = Q.QVBoxLayout(covmat_widget)
    covmat_label = Q.QLabel()
    covmat_label.setWordWrap(True)
    covmat_table = Q.QTableWidget(0, 0)
    covmat_layout.addWidget(covmat_label)
    covmat_layout.addWidget(covmat_table)
    displays["covmat"] = covmat_widget
    tabs.addTab(covmat_widget, "covariance matrix")

    def refresh_covmat():
        covmat_label.setText(composer.covmat_text())
        data = composer.covmat_data()
        if not data:
            covmat_table.setRowCount(0)
            covmat_table.setColumnCount(0)
            return
        params, cm = list(data["params"]), data["covmat"]
        corr, colors = _corr_colors(cm)
        covmat_table.setRowCount(len(params))
        covmat_table.setColumnCount(len(params))
        covmat_table.setHorizontalHeaderLabels(params)
        covmat_table.setVerticalHeaderLabels(params)
        gui_mod = sys.modules[Q.__package__ + ".QtGui"] \
            if Q.__package__ + ".QtGui" in sys.modules else None
        try:
            QtGui = __import__(Q.__package__ + ".QtGui",
                               fromlist=["QtGui"]) if gui_mod is None \
                else gui_mod
        except ImportError:
            QtGui = None
        for i in range(len(params)):
            for j in range(len(params)):
                item = Q.QTableWidgetItem(f"{cm[i, j]:g}")
                if QtGui is not None and colors is not None:
                    item.setBackground(QtGui.QColor(*[
                        int(c) for c in colors[i][j]]))
                    item.setForeground(QtGui.QColor(0, 0, 0))
                covmat_table.setItem(i, j, item)

    def refresh_preview():
        displays["yaml"].setPlainText(composer.yaml_text())
        displays["python"].setPlainText(composer.python_text())
        displays["bibliography"].setPlainText(composer.bib_text())
        refresh_covmat()

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

    def current_tab_name() -> str:
        w = tabs.currentWidget()
        return next(k for k, v in displays.items() if v is w)

    def current_tab_text() -> str:
        name = current_tab_name()
        if name == "covmat":
            return composer.covmat_txt()
        return displays[name].toPlainText()

    def on_save():
        name = current_tab_name()
        path, _ = Q.QFileDialog.getSaveFileName(
            window, "Save input file", "input" + TAB_SUFFIXES[name],
            TAB_FILTERS[name],
        )
        if path:
            if not path.endswith(TAB_SUFFIXES[name]):
                path += TAB_SUFFIXES[name]
            with open(path, "w", encoding="utf-8") as f:
                f.write(current_tab_text())

    def on_copy():
        app.clipboard().setText(current_tab_text())

    def show_defaults_dialog(kind, component):
        texts = component_defaults_texts(component, kind)
        dialog = Q.QWidget()
        dialog.setWindowTitle(f"{kind} : {component}")
        dlg_layout = Q.QVBoxLayout(dialog)
        dlg_tabs = Q.QTabWidget()
        for k in ("yaml", "python", "bibliography"):
            view = Q.QPlainTextEdit()
            view.setReadOnly(True)
            view.setPlainText(texts[k])
            dlg_tabs.addTab(view, k)
        dlg_layout.addWidget(dlg_tabs)
        buttons = Q.QHBoxLayout()
        close_btn = Q.QPushButton("Close")
        close_btn.clicked.connect(dialog.close)
        copy_btn = Q.QPushButton("Copy to clipboard")
        copy_btn.clicked.connect(lambda: app.clipboard().setText(
            dlg_tabs.currentWidget().toPlainText()))
        buttons.addWidget(close_btn)
        buttons.addWidget(copy_btn)
        dlg_layout.addLayout(buttons)
        dialog.resize(500, 500)
        dialog.show()
        window._defaults_dialog = dialog  # keep a reference

    # menu: per-kind component submenus -> defaults dialog
    from ..models.component import get_available_internal_class_names

    menu = window.menuBar().addMenu(
        "&Show defaults and bibliography for a component..."
    )
    for kind in ("theory", "likelihood", "sampler"):
        submenu = menu.addMenu(kind)
        for comp in get_available_internal_class_names(kind):
            action = submenu.addAction(comp)
            action.triggered.connect(
                lambda _=False, k=kind, c=comp: show_defaults_dialog(k, c)
            )

    buttons = Q.QHBoxLayout()
    save_btn = Q.QPushButton("Save as...")
    save_btn.clicked.connect(on_save)
    copy_btn = Q.QPushButton("Copy to clipboard")
    copy_btn.clicked.connect(on_copy)
    buttons.addWidget(save_btn)
    buttons.addWidget(copy_btn)
    form_box.addLayout(buttons)
    layout.addWidget(tabs, 2)

    refresh_preview()
    window.resize(1200, 700)
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
    composer = Composer()
    composer.set_preset(name)
    info = composer.info()
    print("\n" + composer.yaml_text())
    if input("Show bibliography? [y/N]: ").strip().lower() == "y":
        print(composer.bib_text())
    out = input("Save to file (empty to skip): ").strip()
    if out:
        with open(out, "w", encoding="utf-8") as f:
            f.write(composer.yaml_text())
        print(f"Saved to {out}")
    return info


def gui_script(args=None):
    import argparse

    parser = argparse.ArgumentParser(
        prog="cobaya-tpu cosmo-generator",
        description="Graphical input composer for cosmology runs.",
    )
    parser.add_argument("-p", "--packages-path", default=None,
                        help="Packages path (for covmat auto-selection).")
    ns = parser.parse_args(args)
    packages_path = ns.packages_path
    if not packages_path:
        from ..install import resolve_packages_path

        try:
            packages_path = resolve_packages_path()
        except Exception:
            packages_path = None
    qt_widgets = _import_qt()
    if qt_widgets is not None:
        return _run_qt_gui(qt_widgets, packages_path=packages_path)
    print("No Qt binding found (PySide6/PySide2/PyQt5); "
          "using the text prompt.")
    return _run_text_prompt()


# backwards-compatible alias (pre-round-3 name)
_Composer = Composer

if __name__ == "__main__":
    gui_script(sys.argv[1:])
