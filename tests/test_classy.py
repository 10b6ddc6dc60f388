"""classy wrapper contract: full product vocabulary with a mocked CLASS.

Mirrors the collector map of /root/reference/cobaya/theories/classy/classy.py
(lines 252-520) without requiring the CLASS package: a fake ``classy``
module implements the Python-wrapper API with analytic formulas, and the
test checks every product the wrapper must collect.
"""

import numpy as np
import pytest

from cobaya_tpu.models.model import get_model
from cobaya_tpu.theories.classy.classy import classy as ClassyWrapper


class FakeCosmoError(Exception):
    pass


class FakeClassy:
    """Analytic stand-in for classy.Class (flat matter+Lambda, toy Pk)."""

    def __init__(self):
        self.args = {}

    # -- driver API ---------------------------------------------------------
    def set(self, args):
        self.args.update(args)

    def compute(self):
        self._h = float(self.args.get("H0", 70.0)) / 100
        self._Om = 0.3

    def struct_cleanup(self):
        pass

    def _E(self, z):
        return np.sqrt(self._Om * (1 + z) ** 3 + 1 - self._Om)

    # -- products -----------------------------------------------------------
    def T_cmb(self):
        return 2.7255

    def h(self):
        return self._h

    def lensed_cl(self, lmax):
        ells = np.arange(lmax + 1)
        base = 1e-10 / np.maximum(ells, 1) ** 2
        return {"ell": ells, "tt": base, "ee": 0.1 * base,
                "te": 0.3 * base, "pp": 1e-3 * base}

    def raw_cl(self, lmax):
        cl = self.lensed_cl(lmax)
        return {k: (v if k == "ell" else 1.1 * v) for k, v in cl.items()}

    def Hubble(self, z):  # 1/Mpc
        return self._h * 100 * self._E(z) / 299792.458

    def Om_b(self, z):
        return 0.05 * (1 + z) ** 3 / self._E(z) ** 2

    def Om_cdm(self, z):
        return 0.25 * (1 + z) ** 3 / self._E(z) ** 2

    def Om_ncdm(self, z):
        return 0.01 * (1 + z) ** 3 / self._E(z) ** 2

    def angular_distance(self, z):
        return 3000.0 * z / (1 + z) / self._h

    def angular_distance_from_to(self, z1, z2):
        return self.angular_distance(z2) - self.angular_distance(z1)

    def comoving_distance(self, z):
        return 3000.0 * z / self._h

    def effective_f_sigma8(self, z, z_step):
        return 0.45 / self._E(z)

    def sigma(self, R, z, h_units=False):
        return 0.8 * (8.0 / (R * (self._h if h_units else 1.0))) ** 0.5 \
            / (1 + z)

    def sigma_cb(self, R, z, h_units=False):
        return 0.95 * self.sigma(R, z, h_units=h_units)

    def pk(self, k, z):  # k in 1/Mpc, P in Mpc^3
        return 1e4 * (k / 0.05) ** -1.8 / (1 + z) ** 2

    def pk_cb(self, k, z):
        return 0.9 * self.pk(k, z)

    def get_Weyl_pk_and_k_and_z(self):
        # same spectrum as pk(): lets the test check unit conventions
        kk = np.geomspace(1e-6, 30.0, 120)   # 1/Mpc
        zz = np.array([2.0, 1.0, 0.0])       # CLASS returns z descending
        P = np.array([[self.pk(ki, zi) for zi in zz] for ki in kk])
        return P, kk, zz

    def get_current_derived_parameters(self, names):
        table = {"z_reio": 7.7, "age": 13.8, "YHe": 0.245}
        return {n: table[n] for n in names if n in table}

    def rs_drag(self):
        return 147.0 * (0.7 / self._h)

    def Omega_m(self):
        return self._Om

    def sigma8(self):
        return 0.8

    def get_background(self):
        return {"z": np.linspace(0, 10, 5)}


class FakeClassyModule:
    Class = FakeClassy
    CosmoComputationError = FakeCosmoError


@pytest.fixture()
def classy_model(monkeypatch):
    monkeypatch.setattr(
        ClassyWrapper, "get_classy_module",
        classmethod(lambda cls, *a, **k: FakeClassyModule),
    )
    info = {
        "theory": {"classy": None},
        "likelihood": {"one": None},
        "params": {
            "H0": {"prior": [60, 80], "ref": 70.0, "proposal": 1.0},
        },
    }
    return get_model(info)


def test_classy_full_product_vocabulary(classy_model):
    model = classy_model
    zs = np.array([0.0, 0.5, 1.0])
    model.add_requirements({
        "Cl": {"tt": 100, "ee": 80},
        "unlensed_Cl": {"tt": 100},
        "Hubble": {"z": zs},
        "Omega_b": {"z": zs},
        "Omega_cdm": {"z": zs},
        "Omega_nu_massive": {"z": zs},
        "angular_diameter_distance": {"z": zs},
        "angular_diameter_distance_2": {"z_pairs": [(0.2, 0.7),
                                                    (0.1, 1.0)]},
        "comoving_radial_distance": {"z": zs},
        "fsigma8": {"z": zs},
        "sigma8_z": {"z": zs},
        "sigma_R": {"z": zs, "R": np.array([4.0, 8.0]), "k_max": 5.0},
        "Pk_grid": {"z": zs, "k_max": 5.0,
                    "vars_pairs": [("delta_tot", "delta_tot"),
                                   ("delta_nonu", "delta_nonu"),
                                   ("Weyl", "Weyl")]},
        "rdrag": None,
        "z_reio": None,
    })
    lp = model.logposterior([70.0])
    assert np.isfinite(lp.logpost)
    prov = model.provider
    fake = FakeClassy()
    fake.set({"H0": 70.0})
    fake.compute()
    # CMB spectra with units and ell factors
    cl = prov.get_Cl(ell_factor=False, units="1")
    assert np.allclose(cl["tt"][2:], fake.lensed_cl(100)["tt"][2:])
    ucl = prov.get_unlensed_Cl(ell_factor=False, units="1")
    assert np.allclose(ucl["tt"][2:], fake.raw_cl(100)["tt"][2:])
    # background vocabulary
    assert np.allclose(prov.get_Hubble(zs, units="1/Mpc"),
                       fake.Hubble(zs))
    assert np.allclose(prov.get_Omega_b(zs), fake.Om_b(zs))
    assert np.allclose(prov.get_Omega_cdm(zs), fake.Om_cdm(zs))
    assert np.allclose(prov.get_Omega_nu_massive(zs), fake.Om_ncdm(zs))
    assert np.allclose(prov.get_angular_diameter_distance(zs),
                       [fake.angular_distance(z) for z in zs])
    assert np.allclose(
        prov.get_angular_diameter_distance_2([(0.2, 0.7)]),
        [fake.angular_distance_from_to(0.2, 0.7)],
    )
    assert np.allclose(prov.get_comoving_radial_distance(zs),
                       [fake.comoving_distance(z) for z in zs])
    # growth / amplitude vocabulary
    assert np.allclose(prov.get_fsigma8(zs),
                       [fake.effective_f_sigma8(z, 0.1) for z in zs])
    assert np.allclose(prov.get_sigma8_z(zs),
                       [fake.sigma(8 / 0.7, z) for z in zs])
    z_out, R_out, sig = prov.get_sigma_R()
    assert np.allclose(sig[1, 0], fake.sigma(4.0, zs[1]))
    # matter power (both species pairs)
    # reference Pk_grid contract: k in 1/Mpc, P in Mpc^3
    z_pk, k_pk, pk = prov.get_Pk_grid(("delta_tot", "delta_tot"))
    assert np.allclose(pk[0, 0], fake.pk(k_pk[0], 0.0))
    _, _, pk_nonu = prov.get_Pk_grid(("delta_nonu", "delta_nonu"))
    assert np.allclose(pk_nonu, 0.9 * pk)
    # Weyl table shares the (Mpc/h)^3 convention (the mock's Weyl spectrum
    # IS the matter spectrum, so the tables must agree)
    # tolerance: z-interpolation of the mock's coarse (z=0,1,2) Weyl table
    _, _, pk_weyl = prov.get_Pk_grid(("Weyl", "Weyl"))
    assert np.allclose(pk_weyl, pk, rtol=0.06)
    interp = prov.get_Pk_interpolator(("delta_tot", "delta_tot"))
    mid_k = np.sqrt(k_pk[3] * k_pk[4])
    assert np.isclose(
        interp.P(0.5, mid_k), fake.pk(mid_k, 0.5), rtol=1e-3
    )
    # negotiated derived params
    assert np.isclose(prov.get_param("rdrag"), fake.rs_drag())
    assert np.isclose(prov.get_param("z_reio"), 7.7)


def test_classy_failure_is_soft(classy_model, monkeypatch):
    model = classy_model
    model.add_requirements({"Hubble": {"z": [0.5]}})

    def boom(self):
        raise FakeCosmoError("no convergence")

    monkeypatch.setattr(FakeClassy, "compute", boom)
    lp = model.logposterior([70.0], cached=False)
    assert lp.logpost == -np.inf
