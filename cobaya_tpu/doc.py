"""cobaya-tpu-doc: inspect any component's assembled default options.

Capability parity with /root/reference/cobaya/doc.py.
"""

from __future__ import annotations

import argparse

from .models.component import (
    get_available_internal_class_names,
    get_component_class,
)
from .utils.log import logger_setup
from .utils.yamlio import yaml_dump


def doc(component_name: str | None = None, kind: str | None = None,
        return_yaml: bool = True):
    """Defaults of a component (YAML text), or the list of all components."""
    if not component_name:
        return sorted(get_available_internal_class_names(kind))
    cls = get_component_class(component_name, kind=kind)
    defaults = cls.get_defaults(input_options={})
    if return_yaml:
        return yaml_dump({component_name: defaults})
    return defaults


def doc_script(args=None):
    logger_setup()
    parser = argparse.ArgumentParser(
        prog="cobaya-tpu doc",
        description="Print a component's default options.",
    )
    parser.add_argument("component", nargs="?", default=None)
    parser.add_argument("-k", "--kind", default=None,
                        choices=["theory", "likelihood", "sampler"])
    ns = parser.parse_args(args)
    result = doc(ns.component, kind=ns.kind)
    if isinstance(result, list):
        print("Available components:")
        for name in result:
            print("  " + name)
    else:
        print(result)


if __name__ == "__main__":
    doc_script()
