"""cosmo_input presets and grid tools."""

import os

import numpy as np
import pytest

from cobaya_tpu.cosmo_input import create_input
from cobaya_tpu.grid_tools import create_grid, grid_status, run_grid


def test_create_input_preset():
    info = create_input(preset="planck_2018_lite_camb")
    assert "camb" in info["theory"]
    assert "logA" in info["params"]
    assert info["params"]["As"]["value"].startswith("lambda logA")
    assert "planck_2018_highl_plik.TTTEEE_lite" in info["likelihood"]
    # theta parameterization
    assert "theta_MC_100" in info["params"]
    # reference-faithful baseline preset uses the full plik likelihood
    # and the recommended fast-dragging sampler
    info = create_input(preset="planck_2018_camb")
    assert "planck_2018_highl_plik.TTTEEE" in info["likelihood"]
    assert "planck_2018_lensing.clik" in info["likelihood"]
    assert info["sampler"]["mcmc"]["drag"] is True
    # common CMB derived params are attached
    for derived in ("sigma8", "s8omegamp5", "clamp", "rdrag"):
        assert derived in info["params"]


def test_preset_catalog_parity():
    """Model/dataset catalog covers the reference's preset vocabulary.

    Mirrors /root/reference/cobaya/cosmo_input/input_database.py: every
    block family, likelihood combo, and named preset the reference's
    cosmo-generator offers must exist here (plus our native extras).
    """
    from cobaya_tpu.cosmo_input import input_database as db

    assert {"SFSR", "SFSR_DESpriors", "SFSR_lenspriors", "SFSR_run",
            "SFSR_runrun", "SFSR_t", "SFSR_t_nrun"} <= set(db.primordial)
    assert {"flat", "omegak"} <= set(db.geometry)
    assert {"H", "H_DESpriors", "sound_horizon_last_scattering",
            "sound_horizon_lensonly"} <= set(db.hubble)
    assert {"omegab_h2, omegac_h2", "Omegab, Omegam",
            "omegab_h2_lenspriors"} <= set(db.matter)
    assert {"one_heavy_planck", "varying_mnu", "varying_Neff",
            "varying_mnu_Neff"} <= set(db.neutrinos)
    assert {"lambda", "de_w", "de_w_wa"} <= set(db.dark_energy)
    assert {"consistency", "YHe_des_y1", "YHe"} <= set(db.bbn)
    assert {"std", "gauss_prior", "irrelevant"} <= set(db.reionization)
    assert {"planck_NPIPE_CamSpec", "planck_NPIPE_Hillipop", "planck_2018",
            "planck_2018_bk18",
            "planck_2018_CMBmarged_lensing"} <= set(db.like_cmb)
    assert {"BAO_desi_dr2", "BAO_desi_2024", "BAO_planck_2018",
            "BAO_planck_latest"} <= set(db.like_bao)
    assert {"des_y1_clustering", "des_y1_galaxy_galaxy", "des_y1_shear",
            "des_y1_joint"} <= set(db.like_des)
    assert {"PantheonPlus", "Union3", "DESY5", "DESDovekie",
            "Pantheon"} <= set(db.like_sn)
    assert {"Riess2018a", "Riess201903", "Riess2020", "Freedman2020",
            "Riess2020Mb"} <= set(db.like_H0)
    reference_presets = {
        "planck_NPIPE_CamSpec_camb", "planck_NPIPE_CamSpec_classy",
        "planck_NPIPE_Hillipop_camb", "planck_NPIPE_Hillipop_classy",
        "planck_2018_camb", "planck_2018_classy",
        "planck_2018_bicep_camb", "planck_2018_bicep_classy",
        "planck_2018_BAO_camb", "planck_2018_BAO_classy",
        "planck_BAO_latest_camb", "planck_BAO_latest_classy",
        "planck_2018_BAO_SN_camb", "planck_2018_BAO_SN_classy",
        "planck_2018_DES_BAO_SN_camb", "planck_2018_DES_BAO_SN_classy",
        "planck_2018_lensonly_camb", "planck_2018_DES_lensingonly_camb",
        "planck_2018_DES_lensingonly_classy",
    }
    assert reference_presets <= set(db.preset)
    # every preset (except the empty one) composes without error
    for name in db.preset:
        if name == db.none:
            continue
        info = create_input(preset=name)
        assert info.get("likelihood"), name
        assert "params" in info, name


def test_create_input_per_theory_params():
    """theta_s parameterization comes from the classy sub-block."""
    info = create_input(preset="planck_2018_classy")
    assert "theta_s_100" in info["params"]
    assert "theta_MC_100" not in info["params"]
    assert "classy" in info["theory"]


def test_create_input_fields():
    info = create_input(
        theory="camb", primordial="SFSR", geometry="flat", hubble="H",
        matter="omegab_h2, omegac_h2", neutrinos="one_heavy_planck",
        dark_energy="de_w", bbn="consistency", reionization="gauss_prior",
        like_H0="Riess2020", sampler="MCMC dragging",
    )
    assert "w" in info["params"]
    assert info["params"]["tau"]["prior"]["dist"] == "norm"
    assert info["sampler"]["mcmc"]["drag"] is True
    assert "H0.riess2020" in info["likelihood"]


def test_create_input_bad_choice():
    with pytest.raises(ValueError):
        create_input(primordial="nope")


def test_grid_create_run_status(tmp_path):
    grid_dir = str(tmp_path / "grid")
    settings = {
        "defaults": {
            "params": {
                "a": {"prior": [0, 1], "ref": 0.5, "proposal": 0.05},
            },
            "sampler": {"mcmc": {"seed": 1, "n_chains": 8,
                                 "max_samples": 100,
                                 "output_chains": 1}},
        },
        "models": {
            "m1": {"likelihood": {"gaussian_mixture": {
                "means": [[0.5]], "covs": [[[0.01]]],
                "input_params": ["a"]}}},
            "m2": {"likelihood": {"gaussian_mixture": {
                "means": [[0.3]], "covs": [[[0.01]]],
                "input_params": ["a"]}}},
        },
        "datasets": {"d1": {}},
    }
    created = create_grid(grid_dir, settings)
    assert len(created) == 2
    status = grid_status(grid_dir)
    assert all(v == "not started" for v in status.values())
    # job-template emission
    cmds = run_grid(grid_dir, job_template="sbatch run.sh {input} # {name}")
    assert len(cmds) == 2 and "m1_d1" in cmds[0]
    # actually run them
    results = run_grid(grid_dir)
    assert all(not isinstance(r, Exception) for r in results)
    status = grid_status(grid_dir)
    assert all(v in ("done", "in progress") for v in status.values())


def test_convert_cosmomc(tmp_path):
    from cobaya_tpu.cosmo_input.convert_cosmomc import convert_cosmomc_ini

    (tmp_path / "run.paramnames").write_text(
        "omegabh2   \\Omega_b h^2\nH0*   H_0\n"
    )
    (tmp_path / "run.ini").write_text(
        "param[omegabh2] = 0.0224 0.005 0.1 0.0001 0.0001\n"
        "param[tau] = 0.055 0.01 0.8 0.006 0.003\n"
        "param[mnu] = 0.06\n"
        "propose_scale = 1.9\n"
        "file_root = chains/converted\n"
    )
    info = convert_cosmomc_ini(
        str(tmp_path / "run.ini"), str(tmp_path / "run.paramnames")
    )
    assert info["params"]["mnu"] == 0.06
    ob = info["params"]["omegabh2"]
    assert ob["prior"] == {"min": 0.005, "max": 0.1}
    assert ob["proposal"] == 0.0001
    assert ob["latex"] == "\\Omega_b h^2"
    assert info["sampler"]["mcmc"]["proposal_scale"] == 1.9
    assert info["output"] == "chains/converted"
    # the converted params block builds a working model
    from cobaya_tpu.models.model import get_model

    info2 = {"params": info["params"],
             "likelihood": {"one": None}}
    model = get_model(info2)
    assert sorted(model.parameterization.sampled_params()) == [
        "omegabh2", "tau"
    ]


def _mini_grid(tmp_path):
    """A 2-run grid executed to completion (tiny chains)."""
    from cobaya_tpu.grid_tools import create_grid, run_grid

    grid_dir = str(tmp_path / "grid2")
    settings = {
        "defaults": {
            "params": {
                "a": {"prior": [0, 1], "ref": 0.5, "proposal": 0.05},
            },
            "sampler": {"mcmc": {"seed": 3, "n_chains": 8,
                                 "max_samples": 200, "output_chains": 1}},
        },
        "models": {
            "m1": {"likelihood": {"gaussian_mixture": {
                "means": [[0.5]], "covs": [[[0.01]]],
                "input_params": ["a"]}}},
            "m2": {"likelihood": {"gaussian_mixture": {
                "means": [[0.3]], "covs": [[[0.01]]],
                "input_params": ["a"]}}},
        },
    }
    create_grid(grid_dir, settings)
    run_grid(grid_dir)
    return grid_dir


def test_grid_tables_and_manage(tmp_path):
    from cobaya_tpu.grid_tools import (
        grid_cleanup, grid_copy, grid_extract, grid_list, grid_progress,
        grid_tables,
    )

    grid_dir = _mini_grid(tmp_path)
    # latex tables: one per run + a compare table over the shared params
    tex = grid_tables(grid_dir, params=["a"], skip=0.3)
    text = open(tex).read()
    assert text.count(r"\begin{table}") == 3
    assert "m1" in text and "m2" in text and "$a$" in text
    # listing + progress
    listing = grid_list(grid_dir)
    assert set(listing) == {"m1", "m2"}
    assert all(rec["files"] > 0 for rec in listing.values())
    progress = grid_progress(grid_dir)
    assert all(r is None or r >= 0 for r in progress.values())
    # extract covmats
    got = grid_extract(grid_dir, str(tmp_path / "covmats"), exts=(".covmat",))
    assert len(got) == 2
    # copy to zip
    zip_path = str(tmp_path / "out.zip")
    copied = grid_copy(grid_dir, zip_path, zip_output=True)
    assert copied and os.path.exists(zip_path)
    # cleanup (keep converged) then full cleanup
    grid_cleanup(grid_dir, keep_converged=True)
    removed = grid_cleanup(grid_dir, keep_converged=False)
    listing = grid_list(grid_dir)
    assert all(rec["files"] == 0 for rec in listing.values()), (removed,
                                                                listing)


def test_grid_getdist_and_param_compare(tmp_path):
    from cobaya_tpu.grid_tools.gridmanage import grid_getdist
    from cobaya_tpu.grid_tools.gridtables import grid_param_compare

    grid_dir = _mini_grid(tmp_path)
    written = grid_getdist(grid_dir, burn_remove=0.3)
    marge = [f for f in written if f.endswith(".margestats")]
    like = [f for f in written if f.endswith(".likestats")]
    assert len(marge) == 2 and len(like) == 2
    text = open(marge[0]).read()
    assert "parameter" in text and "lower2" in text
    # the 'a' line carries mean/std/CL-bound numbers
    row = next(ln for ln in text.splitlines() if ln.startswith("a "))
    values = [float(v) for v in row.split()[1:]]
    assert len(values) == 6 and 0 < values[0] < 1
    assert "-log(Posterior)" in open(like[0]).read()
    # update_only skips untouched chains
    assert grid_getdist(grid_dir, update_only=True) == []
    # param comparison column content
    lines = grid_param_compare(grid_dir, params=["a"], math_columns=True)
    assert len(lines) == 2
    assert all(r"\pm" in ln and ln.endswith(r"\cr") for ln in lines)
    # tag filter restricts entries
    only_m1 = grid_param_compare(grid_dir, params=["a"], compare=["m1"])
    assert len(only_m1) == 1 and only_m1[0].startswith("m1")


def test_jobqueue_submit_and_delete(tmp_path):
    from cobaya_tpu.grid_tools.jobqueue import (
        JobIndex, JobSettings, delete_jobs, parse_job_id, submit_job,
    )

    batch = str(tmp_path / "batch")
    marker = tmp_path / "ran.txt"
    settings = JobSettings(
        jobname="job1", inputs=["in1.yaml"], engine="sh",
        program=f"touch {marker} # {{input}}",
    )
    # dry run only writes the script
    assert submit_job(batch, settings, dry_run=True) is None
    script = os.path.join(batch, "scripts", "job1.sh")
    assert os.path.exists(script)
    assert "in1.yaml" in open(script).read()
    # real 'sh' submission runs the script and records the job
    job_id = submit_job(batch, settings)
    assert marker.exists()
    index = JobIndex(batch)
    assert job_id in index.jobs
    assert index.by_name("job1") == job_id
    # delete clears the record
    assert delete_jobs(batch, names=["job1"]) == [job_id]
    assert JobIndex(batch).jobs == {}
    assert parse_job_id("Submitted batch job 4242\n") == "4242"


def test_gui_composer_backend():
    """The GUI composer produces the same inputs as create_input; Qt is
    optional (text fallback when no binding is importable)."""
    from cobaya_tpu.cosmo_input import create_input
    from cobaya_tpu.cosmo_input.gui import _Composer, _field_choices

    c = _Composer()
    c.set_preset("planck_2018_camb")
    info = c.info()
    assert info == create_input(preset="planck_2018_camb")
    assert "theory" in c.yaml_text()
    # manual field choice propagates
    c2 = _Composer()
    c2.choices["hubble"] = "H"
    c2.choices["primordial"] = "SFSR"
    c2.choices["like_H0"] = "Riess2020"
    info2 = c2.info()
    assert "H0.riess2020" in info2["likelihood"]
    assert "none" in _field_choices("geometry") or _field_choices("geometry")


def test_gui_display_tabs(tmp_path):
    """All four display tabs render headlessly (reference gui.py:137-153):
    yaml with preset comments, python dict, bibliography blocks, and the
    auto-selected covmat (text + .covmat serialization)."""
    import numpy as np

    from cobaya_tpu.cosmo_input.gui import (
        Composer,
        component_defaults_texts,
    )

    c = Composer()
    c.set_preset("planck_2018_camb")
    # yaml/python tabs carry the preset field comments
    assert "theory" in c.yaml_text()
    assert c.python_text().startswith("info = {")
    # bibliography collects per-component blocks incl. the framework's
    bib = c.bib_text()
    assert "% ===== framework =====" in bib
    assert "planck" in bib.lower()
    # covmat tab: no packages path -> explanatory text, empty export
    assert "packages" in c.covmat_text()
    assert c.covmat_txt() == ""
    # with a covmat database: selection + export round-trips
    covdir = tmp_path / "data" / "planck_supp_data_and_covmats" / "covmats"
    covdir.mkdir(parents=True)
    cov = np.array([[0.04, 0.001], [0.001, 0.09]])
    np.savetxt(covdir / "base_plikHM_TTTEEE_lowl_lowE.covmat", cov,
               header="logA ns")
    c2 = Composer(packages_path=str(tmp_path))
    c2.set_preset("planck_2018_camb")
    data = c2.covmat_data()
    if data is not None:  # preset params matched the tiny database
        assert data["covmat"].shape[0] == len(data["params"])
        exported = c2.covmat_txt()
        assert exported.startswith("# ")
        parsed = np.loadtxt(exported.splitlines(), ndmin=2)
        assert parsed.shape == data["covmat"].shape
        assert "'%s'" % data["name"] in c2.covmat_text()
    # defaults dialog backend: yaml/python/bibliography for any component
    texts = component_defaults_texts("mcmc", "sampler")
    assert set(texts) == {"yaml", "python", "bibliography"}
    assert "mcmc" in texts["yaml"]
    assert "Lewis" in texts["bibliography"] or "@" in texts["bibliography"]


def test_gui_corr_colors():
    """Correlation coloring backend: diagonal white, off-diagonal mapped."""
    import numpy as np

    from cobaya_tpu.cosmo_input.gui import _corr_colors

    cov = np.array([[4.0, -1.2], [-1.2, 1.0]])
    corr, colors = _corr_colors(cov)
    assert corr[0, 0] == 1.0
    assert abs(corr[0, 1] - (-0.6)) < 1e-12
    if colors is not None:  # matplotlib present
        assert colors[0][0] == [255.99] * 3
        assert len(colors[0][1]) == 3


def test_grid_importance_and_minimize_jobs(tmp_path):
    """Chain -> importance post -> minimize end-to-end on a toy model
    (reference capability: gridconfig.py:211-351, batchjob.py:92-142)."""
    grid_dir = str(tmp_path / "grid")
    settings = {
        "defaults": {
            "params": {
                "a": {"prior": [0, 1], "ref": 0.5, "proposal": 0.05},
            },
            "sampler": {"mcmc": {"seed": 1, "n_chains": 8,
                                 "max_samples": 300,
                                 "output_chains": 1}},
        },
        "models": {
            "m1": {"likelihood": {"gaussian_mixture": {
                "means": [[0.5]], "covs": [[[0.01]]],
                "input_params": ["a"]}}},
        },
        "datasets": {"d1": {}},
        "minimize_defaults": {"seed": 3},
        "importance_runs": {
            "tilt": {"add": {"prior": {
                "tilt": "lambda a: -10 * (a - 0.45) ** 2"}}},
        },
    }
    created = create_grid(grid_dir, settings)
    names = sorted(os.path.basename(p) for p in created)
    assert names == ["m1_d1.minimize.yaml", "m1_d1.post.tilt.minimize.yaml",
                     "m1_d1.post.tilt.yaml", "m1_d1.yaml"]
    # ordering: chains first, then post over the stored chains, minimize
    results = run_grid(grid_dir)
    assert all(not isinstance(r, Exception) for r in results)
    results = run_grid(grid_dir, kind="importance")
    assert all(not isinstance(r, Exception) for r in results), results
    assert os.path.exists(
        str(tmp_path / "grid" / "m1_d1" / "m1_d1.post.tilt.1.txt"))
    results = run_grid(grid_dir, kind="minimize")
    assert all(not isinstance(r, Exception) for r in results), results
    assert os.path.exists(
        str(tmp_path / "grid" / "m1_d1" / "m1_d1.minimum.txt"))
    status = grid_status(grid_dir)
    assert status["m1_d1"] in ("done", "in progress")
    assert status["m1_d1.post.tilt"] == "done"
    assert status["m1_d1.minimize"] == "done"


def test_grid_auto_covmat_resolution(tmp_path):
    """'covmat: auto' resolves against the library at grid-creation time."""
    import numpy as np

    covdir = tmp_path / "covmats"
    covdir.mkdir()
    with open(covdir / "base_toy.covmat", "w") as f:
        f.write("# a\n")
        np.savetxt(f, [[0.01]])
    grid_dir = str(tmp_path / "grid")
    settings = {
        "defaults": {
            "params": {"a": {"prior": [0, 1], "ref": 0.5,
                             "proposal": 0.05}},
            "sampler": {"mcmc": {"covmat": "auto", "max_samples": 50}},
        },
        "models": {"m": {"likelihood": {"gaussian_mixture": {
            "means": [[0.5]], "covs": [[[0.01]]],
            "input_params": ["a"]}}}},
        "datasets": {"d": {}},
        "cov_dir": str(covdir),
    }
    created = create_grid(grid_dir, settings)
    from cobaya_tpu.utils.yamlio import yaml_load_file

    info = yaml_load_file([p for p in created
                           if p.endswith("m_d.yaml")][0])
    assert info["sampler"]["mcmc"]["covmat"].endswith("base_toy.covmat")


def test_grid_groups_manifest_and_filters(tmp_path):
    """Group-based grid schema + jobs.yaml manifest + BatchFilter
    selection (reference: batchjob.py:563-608, batchjob_args.py:190-270)."""
    from cobaya_tpu.grid_tools import batch

    grid_dir = str(tmp_path / "grid")
    like = lambda mu: {"likelihood": {"gaussian_mixture": {
        "means": [[mu]], "covs": [[[0.01]]], "input_params": ["a"]}}}
    settings = {
        "base": "base",
        "defaults": {
            "params": {"a": {"prior": [0, 1], "ref": 0.5,
                             "proposal": 0.05}},
            "sampler": {"mcmc": {"seed": 1, "n_chains": 8,
                                 "max_samples": 100,
                                 "output_chains": 1}},
        },
        "models": {"mnu": like(0.5), "nnu": like(0.3), "": like(0.4)},
        "datasets": {"plikHM_TT": {}, "plikHM_TTTEEE_lowl": {}},
        "groups": {
            "main": {"models": ["", "mnu"],
                     "datasets": ["plikHM_TT", "plikHM_TTTEEE_lowl"],
                     "importance_runs": {"BAO": {"add": {"prior": {
                         "t": "lambda a: -(a - 0.45) ** 2"}}}}},
            "ext": {"models": ["nnu"], "datasets": ["plikHM_TT"],
                    "skip": []},
        },
    }
    created = create_grid(grid_dir, settings)
    jobs = batch.load_jobs(grid_dir)
    by_name = {j.name: j for j in jobs}
    # naming: base prefix + model + dataset; group recorded
    assert "base_plikHM_TT" in by_name  # empty model name
    assert by_name["base_mnu_plikHM_TT"].group == "main"
    assert by_name["base_nnu_plikHM_TT"].group == "ext"
    assert by_name["base_mnu_plikHM_TT"].param_tags == ["mnu"]
    assert by_name["base_mnu_plikHM_TTTEEE_lowl"].data_tags == [
        "plikHM", "TTTEEE", "lowl"]
    # importance jobs only for the group that declares them
    assert "base_mnu_plikHM_TT.post.BAO" in by_name
    assert by_name["base_mnu_plikHM_TT.post.BAO"].kind == "importance"
    assert by_name["base_mnu_plikHM_TT.post.BAO"].parent == \
        "base_mnu_plikHM_TT"
    assert not any(j.name.startswith("base_nnu") and j.is_importance
                   for j in jobs)

    # BatchFilter vocabulary
    import argparse

    parser = argparse.ArgumentParser()
    batch.BatchFilter.add_arguments(parser, converge=True, notexist=True)

    def select(argv, **kw):
        return {j.name for j in batch.BatchFilter.select(
            jobs, parser.parse_args(argv), grid_dir=grid_dir, **kw)}

    assert select(["--param", "mnu", "--noimportance"]) == {
        "base_mnu_plikHM_TT", "base_mnu_plikHM_TTTEEE_lowl"}
    assert select(["--data", "TTTEEE", "--noimportance"]) == {
        "base_plikHM_TTTEEE_lowl", "base_mnu_plikHM_TTTEEE_lowl"}
    assert select(["--musthave-data", "plikHM", "lowl",
                   "--noimportance"]) == {
        "base_plikHM_TTTEEE_lowl", "base_mnu_plikHM_TTTEEE_lowl"}
    assert select(["--group", "ext"]) == {"base_nnu_plikHM_TT"}
    assert select(["--skip-group", "main", "--skip-param", "nnu"]) == set()
    assert select(["--name", "*mnu*TT", "--noimportance"]) == {
        "base_mnu_plikHM_TT"}
    assert select(["--paramtag", "base_mnu", "--noimportance"]) == {
        "base_mnu_plikHM_TT", "base_mnu_plikHM_TTTEEE_lowl"}
    # --importance restricts to importance jobs of the given data name
    assert select(["--importance", "BAO"]) == {
        "base_mnu_plikHM_TT.post.BAO", "base_plikHM_TT.post.BAO",
        "base_mnu_plikHM_TTTEEE_lowl.post.BAO",
        "base_plikHM_TTTEEE_lowl.post.BAO"}
    # --notexist: nothing has chains yet -> everything; after running one
    # parent chain, that job drops out
    assert "base_nnu_plikHM_TT" in select(["--notexist"])
    run_grid(grid_dir, jobs=[by_name["base_nnu_plikHM_TT"]])
    assert "base_nnu_plikHM_TT" not in select(["--notexist"])
    assert grid_status(grid_dir)["base_nnu_plikHM_TT"] in (
        "done", "in progress")

    # manifest round-trips: rebuild from input files only (pre-manifest
    # grids) still classifies kinds correctly
    os.remove(os.path.join(grid_dir, batch.JOBS_FILE))
    rebuilt = {j.name: j for j in batch.load_jobs(grid_dir)}
    assert rebuilt["base_mnu_plikHM_TT.post.BAO"].kind == "importance"
    assert rebuilt["base_mnu_plikHM_TT"].kind == "chains"
