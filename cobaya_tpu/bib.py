"""cobaya-tpu-bib: collect bibliography of the components used by an input.

Capability parity with /root/reference/cobaya/bib.py: per-component
``.bibtex`` files (resolved through the class hierarchy) plus arXiv tags in
docstrings, aggregated over every component mentioned in one or more inputs.
"""

from __future__ import annotations

import argparse
import re

from .models.component import get_component_class
from .models.input_ import get_used_components, load_input_dict
from .utils import conventions as cv
from .utils.log import logger_setup

_ARXIV_RE = re.compile(r"arXiv:\s*([0-9]{4}\.[0-9]{4,5}|[a-z\-]+/[0-9]{7})",
                       re.I)

FRAMEWORK_BIB = """\
% cobaya_tpu is a TPU-native reimplementation of the cobaya framework:
@article{Torrado:2020dgo,
    author = "Torrado, Jesus and Lewis, Antony",
    title = "{Cobaya: Code for Bayesian Analysis of hierarchical physical
              models}",
    eprint = "2005.05290",
    archivePrefix = "arXiv",
    journal = "JCAP", volume = "05", pages = "057", year = "2021"
}
"""


def get_bib_component(component_name: str, kind: str | None = None) -> str:
    cls = get_component_class(component_name, kind=kind)
    bib = cls.get_bibtex()
    if bib:
        return bib
    refs = _ARXIV_RE.findall(cls.get_desc() or "")
    if refs:
        return "\n".join(f"% arXiv:{r}" for r in refs)
    return "% [no references given]"


def get_bib_info(*infos, logger=None) -> dict[str, str]:
    used = get_used_components(*[load_input_dict(i) for i in infos])
    blocks = {"framework": FRAMEWORK_BIB}
    for kind in cv.kinds:
        for name in used[kind]:
            try:
                blocks[name] = get_bib_component(name, kind)
            except Exception:
                blocks[name] = "% [component not found]"
    return blocks


def bib_script(args=None):
    logger_setup()
    parser = argparse.ArgumentParser(
        prog="cobaya-tpu bib",
        description="Collect bibliography for inputs or components.",
    )
    parser.add_argument("files_or_components", nargs="+")
    ns = parser.parse_args(args)
    import os

    if all(os.path.exists(f) for f in ns.files_or_components):
        blocks = get_bib_info(*ns.files_or_components)
    else:
        blocks = {
            name: get_bib_component(name)
            for name in ns.files_or_components
        }
    for name, bib in blocks.items():
        print(f"% ===== {name} =====")
        print(bib)
        print()


if __name__ == "__main__":
    bib_script()
