"""Documentation snippets stay runnable.

The reference validates its docs examples (tests/test_docs_*.py); here:
every ```python block in docs/ must compile, every `from X import Y` it
contains must resolve, and the end-to-end snippets (quickstart YAML + run,
external likelihood run, cosmo-input preset composer, post/load_samples)
execute against a real run.
"""

import glob
import importlib
import os
import re

import numpy as np
import pytest

DOCS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "docs")


def _blocks(markdown_file, lang="python"):
    text = open(markdown_file, encoding="utf-8").read()
    return re.findall(rf"```{lang}\n(.*?)```", text, re.S)


@pytest.mark.parametrize("md", sorted(glob.glob(os.path.join(DOCS, "*.md"))),
                         ids=os.path.basename)
def test_docs_python_blocks_compile_and_import(md):
    for block in _blocks(md):
        compile(block, md, "exec")  # syntax must be valid
        for line in block.splitlines():
            m = re.match(r"from ([\w.]+) import ([\w, ]+)$", line.strip())
            if not m or not m.group(1).startswith("cobaya_tpu"):
                continue
            mod = importlib.import_module(m.group(1))
            for name in m.group(2).split(","):
                assert hasattr(mod, name.strip()), (md, line)


def test_docs_quickstart_runs(tmp_path, monkeypatch):
    """The quickstart YAML + Python snippet work verbatim (plus a sample cap
    so the test is quick)."""
    md = os.path.join(DOCS, "quickstart.md")
    yaml_block = _blocks(md, lang="yaml")[0].replace(
        "n_chains: 1024", "n_chains: 64\n    max_samples: 400"
    )
    monkeypatch.chdir(tmp_path)
    with open("gaussian.yaml", "w", encoding="utf-8") as f:
        f.write(yaml_block)
    ns: dict = {}
    exec(_blocks(md)[0], ns)
    assert os.path.exists("chains/gaussian.1.txt")
    assert os.path.exists("chains/gaussian.updated.yaml")
    sample = ns["sample"]
    assert sample.mean().shape == (2,)
    # analysis helpers advertised right below the snippet
    from cobaya_tpu import load_samples

    full = load_samples("chains/gaussian", combined=True)
    assert len(full) > 0
    sample.to_pandas()


def test_docs_external_likelihood_runs(tmp_path, monkeypatch):
    md = os.path.join(DOCS, "external_likelihoods.md")
    block = _blocks(md)[0].replace("max_samples\": 5000", "max_samples\": 300")
    monkeypatch.chdir(tmp_path)
    exec(block, {})


def test_docs_custom_likelihood_classes_run():
    md = os.path.join(DOCS, "external_likelihoods.md")
    blocks = _blocks(md)
    ns: dict = {}
    exec(blocks[1], ns)  # host-side Likelihood subclass
    exec(blocks[2], ns)  # jittable subclass
    from cobaya_tpu.models.model import get_model

    logps = {}
    for key in ("Ring", "RingJit"):
        m = get_model({
            "params": {"x": {"prior": [-1, 1]}, "y": {"prior": [-1, 1]}},
            "likelihood": {key.lower(): ns[key]},
        })
        logps[key] = float(m.loglikes(np.array([0.3, 0.4]))[0][0])
    assert np.isclose(logps["Ring"], logps["RingJit"], atol=1e-5)


def test_docs_cosmo_input_block_runs():
    md = os.path.join(DOCS, "cosmology.md")
    ns: dict = {}
    exec(_blocks(md)[0], ns)
    info = ns["info"]
    assert "theory" in info and "params" in info


def test_docs_post_and_load_samples_run(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from cobaya_tpu.run import run

    run({
        "params": {
            "omegam": {"prior": [0.1, 0.9], "ref": 0.3, "proposal": 0.02},
            "H0": {"prior": [50, 90], "ref": 70, "proposal": 1.0},
        },
        "likelihood": {"gaussian_mixture": {
            "means": [[0.3, 70.0]], "covs": [[[0.001, 0.0], [0.0, 4.0]]],
            "input_params": ["omegam", "H0"],
        }},
        "sampler": {"mcmc": {"seed": 2, "n_chains": 8, "max_samples": 400,
                             "measure_speeds": False, "fetch_chains": 8,
                             "output_chains": 2}},
        "output": "chains/run", "force": True,
    })
    # post doc block, with the cosmology add/remove swapped for params
    # available in this toy chain
    from cobaya_tpu.post import post

    info = {
        "output": "chains/run",
        "post": {
            "suffix": "OM",
            "add": {"params": {"omegam_h2": {
                "derived": "lambda omegam, H0: omegam*(H0/100)**2"}}},
            "skip": 0.3,
        },
    }
    updated_info, result = post(info)
    assert "omegam_h2" in updated_info["params"]
    # output_and_resume doc block essentials
    from cobaya_tpu.io.output import load_samples

    colls = load_samples("chains/run")
    assert isinstance(colls, list) and len(colls) == 2
    full = load_samples("chains/run", combined=True, skip=0.3)
    stats = full.get_stats()
    assert "omegam" in stats


def test_bibtex_catalog_coverage():
    """Every experiment likelihood, sampler and theory cites its papers
    (reference ships 40 .bibtex files; cobaya-tpu-bib must cover the same
    component set)."""
    from cobaya_tpu.models.component import get_component_class

    likelihoods = [
        "H0.riess2018a", "H0.riess2018b", "H0.riess201903", "H0.riess2020",
        "H0.riess2020Mb", "H0.freedman2020",
        "bao.sixdf_2011_bao", "bao.sdss_dr7_mgs",
        "bao.sdss_dr12_consensus_bao", "bao.sdss_dr12_consensus_final",
        "bao.sdss_dr12_consensus_full_shape", "bao.sdss_dr12_lrg_bao_dmdh",
        "bao.sdss_dr16_bao_elg", "bao.sdss_dr16_baoplus_elg",
        "bao.sdss_dr16_baoplus_lrg", "bao.sdss_dr16_baoplus_lyauto",
        "bao.sdss_dr16_baoplus_lyxqso", "bao.sdss_dr16_baoplus_qso",
        "bao.sdss_dr16_lrg_bao_dmdh", "bao.sdss_dr16_qso_bao_dmdh",
        "bao.desi_2024_bao_all", "bao.desi_dr2.desi_bao_all",
        "sn.jla", "sn.jla_lite", "sn.pantheon", "sn.pantheonplus",
        "sn.pantheonplusshoes", "sn.union3", "sn.desy5",
        "planck_2018_highl_plik.TTTEEE",
        "planck_2018_highl_plik.TTTEEE_lite_native",
        "planck_2018_lowl.TT", "planck_2018_lowl.EE",
        "planck_2018_lowl.EE_sroll2",
        "planck_2018_highl_CamSpec.TTTEEE",
        "planck_2018_highl_CamSpec2021.TTTEEE",
        "planck_NPIPE_highl_CamSpec.TTTEEE",
        "planck_2018_lensing.native", "planck_2018_lensing.clik",
        "bicep_keck_2018.bicep_keck_2018", "des_y1.joint",
    ]
    missing = []
    for name in likelihoods:
        cls = get_component_class(name, kind="likelihood")
        bib = cls.get_bibtex()
        if not bib or "@" not in bib:
            missing.append(name)
    for kind, name in [("sampler", "mcmc"), ("sampler", "minimize"),
                       ("sampler", "polychord"), ("sampler", "nested"),
                       ("sampler", "hmc"), ("theory", "camb"),
                       ("theory", "classy")]:
        cls = get_component_class(name, kind=kind)
        bib = cls.get_bibtex()
        if not bib or "@" not in bib:
            missing.append(name)
    assert not missing, missing
