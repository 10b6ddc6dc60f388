"""cosmo_input presets and grid tools."""

import os

import numpy as np
import pytest

from cobaya_tpu.cosmo_input import create_input
from cobaya_tpu.grid_tools import create_grid, grid_status, run_grid


def test_create_input_preset():
    info = create_input(preset="planck_2018_camb")
    assert "camb" in info["theory"]
    assert "logA" in info["params"]
    assert info["params"]["As"]["value"].startswith("lambda logA")
    assert "planck_2018_highl_plik.TTTEEE_lite" in info["likelihood"]
    # theta parameterization
    assert "theta_MC_100" in info["params"]


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
