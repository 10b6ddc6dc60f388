"""CAMB transfers helper: fast/slow split inside the Boltzmann interface.

Mirrors the reference's CambTransfers design (reference camb.py:1161-1250):
transfer-function parameters route to a helper theory whose result is cached
while only initial-power parameters change.  Uses a fake ``camb`` module with
call counters; also exercises the jit object-token bridge (per-walker host
states flowing through the device program).
"""

import numpy as np
import pytest

from cobaya_tpu.models.model import get_model

LMAX = 24


class FakeInitPower:
    def __init__(self):
        self.ns = 0.96
        self.As = 2e-9

    def set_params(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


class FakePars:
    def __init__(self, **kw):
        self.kw = dict(kw)
        self.InitPower = FakeInitPower()
        self.Alens = 1.0
        self.H0 = kw.get("H0", 67.0)
        self.TCMB = 2.7255

    def copy(self):
        new = type(self)(**self.kw)
        new.InitPower.__dict__.update(self.InitPower.__dict__)
        new.Alens = self.Alens
        return new


class FakeResults:
    def __init__(self, pars, perts):
        self.Params = pars
        self.perts = perts
        self._power_pars = pars

    def calc_power_spectra(self, pars):
        self._power_pars = pars

    def get_cmb_power_spectra(self, pars, CMB_unit=None, raw_cl=True):
        # tt depends on a transfer param (ombh2) and an initial-power param
        # (ns), so both halves of the split are observable
        ells = np.arange(LMAX + 1)
        ombh2 = self.Params.kw.get("ombh2", 0.022)
        ns = pars.InitPower.ns
        tt = ombh2 * 1e3 / (1 + ells) ** (2 - ns)
        total = np.zeros((LMAX + 1, 4))
        total[:, 0] = tt
        return {"total": total}

    def get_derived_params(self):
        return {"rdrag": 147.0 + 1e3 * self.Params.kw.get("ombh2", 0.022)}

    def get_Omega(self, comp):
        return 0.1

    def get_sigma8_0(self):
        # sigma8 scales as sqrt(As): lets the sigma8-input rescale be tested
        return 0.8 * np.sqrt(self._power_pars.InitPower.As / 2e-9)

    def get_matter_power_spectrum(self, minkh=1e-4, maxkh=2.0, npoints=200,
                                  var1=None, var2=None):
        # CAMB's native convention: kh in h/Mpc, P in (Mpc/h)^3; the
        # underlying physical spectrum is P_Mpc(k) = 1e4 (k/0.05)^-1.8
        h = self.Params.H0 / 100.0
        kh = np.geomspace(minkh, maxkh, npoints)
        z = np.asarray(self.Params.kw.get("redshifts", [0.0]))[::-1]
        p_mpc = 1e4 * (kh * h / 0.05) ** -1.8
        pk = np.broadcast_to(p_mpc * h ** 3, (len(z), len(kh))).copy()
        return kh, z, pk


class FakeCamb:
    __version__ = "1.5.5"

    def __init__(self):
        self.counts = {"transfers": 0, "background": 0, "results": 0}

    def set_params(self, **kw):
        return FakePars(**kw)

    def get_transfer_functions(self, pars, only_time_sources=False):
        self.counts["transfers"] += 1
        return FakeResults(pars, perts=True)

    def get_background(self, pars):
        self.counts["background"] += 1
        return FakeResults(pars, perts=False)

    def get_results(self, pars):
        self.counts["results"] += 1
        return FakeResults(pars, perts=True)


from cobaya_tpu.models.likelihood import Likelihood


class ClLike(Likelihood):
    jittable = False

    def get_requirements(self):
        return {"Cl": {"tt": LMAX}}

    def logp(self, _derived=None, **params_values):
        cl = self.provider.get_Cl(units="1")
        return -0.5 * float(np.sum(cl["tt"][2:] ** 2))


@pytest.fixture()
def camb_model(monkeypatch):
    from cobaya_tpu.theories.camb.camb import CAMB

    fake = FakeCamb()
    monkeypatch.setattr(
        CAMB, "get_camb_module", classmethod(lambda cls, *a, **k: fake)
    )
    info = {
        "theory": {"camb": {"use_transfer_helper": True}},
        "likelihood": {"cl_like": {"external": ClLike, "input_params": []}},
        "params": {
            "ombh2": {"prior": [0.02, 0.024], "ref": 0.022},
            "ns": {"prior": [0.9, 1.0], "ref": 0.96},
            "H0": 67.0,
        },
    }
    return get_model(info), fake


def test_transfer_helper_split_and_caching(camb_model):
    model, fake = camb_model
    # helper joined the theory collection and owns the transfer param
    assert "camb.transfers" in model.theory
    helper = model.theory["camb.transfers"]
    host = model.theory["camb"]
    assert "ombh2" in helper.input_params
    assert "ns" in host.input_params and "ombh2" not in host.input_params
    # eager: moving only ns reuses cached transfers
    lp1 = model.loglikes([0.022, 0.96], cached=True)[0]
    assert fake.counts["transfers"] == 1
    lp2 = model.loglikes([0.022, 0.98], cached=True)[0]
    assert fake.counts["transfers"] == 1  # cache hit on the slow half
    assert not np.isclose(lp1[0], lp2[0])  # but the answer changed
    model.loglikes([0.023, 0.98], cached=True)
    assert fake.counts["transfers"] == 2  # slow move recomputes
    assert fake.counts["results"] == 0  # full pipeline never re-ran


def test_transfer_helper_jit_token_bridge(camb_model):
    """Per-walker CAMBdata objects flow through jit via int32 tokens."""
    import jax
    import jax.numpy as jnp

    model, fake = camb_model
    fn = model.make_logposterior_fn()
    xs = np.array([[0.021, 0.95], [0.022, 0.97], [0.0235, 0.99]])
    _, _, loglikes, _ = jax.vmap(fn)(jnp.asarray(xs))
    expected = [model.loglikes(x, cached=False)[0][0] for x in xs]
    assert np.allclose(np.asarray(loglikes)[:, 0], expected, rtol=1e-5)


def test_transfer_helper_blocked_work_avoidance(camb_model):
    """Blocked evaluator: a fast-block (ns) move does not recompute the
    transfers helper; a slow-block (ombh2) move does."""
    import jax.numpy as jnp

    model, fake = camb_model
    full_eval, block_eval = model.make_blocked_logposterior_fn([[0], [1]])
    x0 = jnp.asarray([0.022, 0.96])
    lp0, _, _, _, cache = full_eval(x0)
    base = fake.counts["transfers"]
    # fast move: block 1 (ns)
    x1 = jnp.asarray([0.022, 0.99])
    lp1, _, ll1, _, cache1 = block_eval(jnp.int32(1), x1, cache)
    assert fake.counts["transfers"] == base
    # matches a fresh full evaluation
    lp1_full, _, ll1_full, _, _ = full_eval(x1)
    assert np.isclose(float(lp1), float(lp1_full), rtol=1e-5)
    base = fake.counts["transfers"]
    # slow move: block 0 (ombh2) recomputes the helper
    x2 = jnp.asarray([0.021, 0.99])
    lp2, _, _, _, _ = block_eval(jnp.int32(0), x2, cache1)
    assert fake.counts["transfers"] > base
    lp2_full, _, _, _, _ = full_eval(x2)
    assert np.isclose(float(lp2), float(lp2_full), rtol=1e-5)


def test_sigma8_as_input(monkeypatch):
    """sigma8 may replace As as the power-amplitude input: As is rescaled
    on the cached transfers so sigma8(0) hits the requested value
    (reference camb.py:731-736 and test_cosmo_camb_sigma_8_input.py)."""
    from cobaya_tpu.theories.camb.camb import CAMB

    fake = FakeCamb()
    monkeypatch.setattr(
        CAMB, "get_camb_module", classmethod(lambda cls, *a, **k: fake)
    )
    info = {
        "theory": {"camb": {"use_transfer_helper": True}},
        "likelihood": {"cl_like": {"external": ClLike, "input_params": []}},
        "params": {
            "ombh2": {"prior": [0.02, 0.024], "ref": 0.022},
            "sigma8": {"prior": [0.6, 1.0], "ref": 0.78},
            "H0": 67.0,
            "As": {"derived": True, "latex": "A_s"},
        },
    }
    from cobaya_tpu.models.model import get_model

    model = get_model(info)
    host = model.theory["camb"]
    assert "sigma8" in host.input_params
    lp = model.logposterior({"ombh2": 0.022, "sigma8": 0.7})
    As = lp.derived[model.derived_names.index("As")]
    # fake: sigma8 = 0.8 * sqrt(As / 2e-9)  ->  As = 2e-9 (0.7/0.8)^2
    assert np.isclose(As, 2e-9 * (0.7 / 0.8) ** 2, rtol=1e-6), As
    # both As and sigma8 as input is rejected
    import pytest as _pytest

    from cobaya_tpu.utils.log import LoggedError

    bad = {
        "theory": {"camb": {}},
        "likelihood": {"cl_like": {"external": ClLike, "input_params": []}},
        "params": {
            "ombh2": 0.022, "H0": 67.0,
            "sigma8": {"prior": [0.6, 1.0]},
            "As": {"prior": [1e-9, 3e-9]},
        },
    }
    with _pytest.raises(LoggedError):
        get_model(bad)


def test_external_primordial_pk(monkeypatch):
    """external_primordial_pk: a separate theory provides the primordial
    P(k) table, installed on InitPower before power spectra (reference
    test_cosmo_multi_theory.py's ExamplePrimordialPk pattern)."""
    from cobaya_tpu.models.theory import Theory
    from cobaya_tpu.theories.camb.camb import CAMB

    class FakeInitPowerTable(FakeInitPower):
        def __init__(self):
            super().__init__()
            self.table = None

        def set_scalar_log_regular(self, kmin, kmax, Pk):
            self.table = (kmin, kmax, np.asarray(Pk))

    class FakeParsTable(FakePars):
        def __init__(self, **kw):
            super().__init__(**kw)
            self.InitPower = FakeInitPowerTable()

    class FakeCambTable(FakeCamb):
        def set_params(self, **kw):
            return FakeParsTable(**kw)

    class MyPk(Theory):
        jittable = False

        def get_can_support_params(self):
            return ["testAs", "testns"]

        def get_can_provide(self):
            return ["primordial_scalar_pk"]

        def calculate(self, state, want_derived=True, **params_values):
            ks = np.logspace(-5, 1, 50)
            state["primordial_scalar_pk"] = {
                "kmin": ks[0], "kmax": ks[-1],
                "Pk": params_values["testAs"]
                * (ks / 0.05) ** (params_values["testns"] - 1),
                "log_regular": True,
            }
            state["derived"] = {}

        def get_primordial_scalar_pk(self):
            return self.current_state["primordial_scalar_pk"]

    fake = FakeCambTable()
    monkeypatch.setattr(
        CAMB, "get_camb_module", classmethod(lambda cls, *a, **k: fake)
    )
    info = {
        "theory": {
            "camb": {"external_primordial_pk": True,
                     "use_transfer_helper": True},
            "my_pk": {"external": MyPk},
        },
        "likelihood": {"cl_like": {"external": ClLike, "input_params": []}},
        "params": {
            "ombh2": {"prior": [0.02, 0.024], "ref": 0.022},
            "testAs": {"prior": [1e-9, 3e-9], "ref": 1.8e-9},
            "testns": {"prior": [0.8, 1.1], "ref": 0.9},
            "H0": 67.0,
        },
    }
    model = get_model(info)
    host = model.theory["camb"]
    assert host.external_primordial_pk
    # the primordial-pk theory owns the power params, not camb
    assert set(model.theory["my_pk"].input_params) == {"testAs", "testns"}
    lp = model.logposterior({"ombh2": 0.022, "testAs": 1.8e-9,
                             "testns": 0.9})
    assert np.isfinite(lp.loglikes[0])
    # the table was installed on InitPower with the declared amplitude
    data = host.current_state["CAMBdata"]
    kmin, kmax, Pk = data._power_pars.InitPower.table
    assert np.isclose(Pk[0], 1.8e-9 * (1e-5 / 0.05) ** (0.9 - 1))


def test_camb_pk_grid_reference_units(camb_model):
    """Pk_grid follows the reference contract — k in 1/Mpc, P in Mpc^3
    (reference boltzmannbase.py:533-542) — independent of CAMB's native
    h-unit helper output."""
    model, _ = camb_model
    model.add_requirements({"Pk_grid": {
        "z": [0.0, 0.5], "k_max": 2.0,
        "vars_pairs": [("delta_tot", "delta_tot")],
    }})
    model.logposterior([0.022, 0.96])
    z, k, pk = model.provider.get_Pk_grid(("delta_tot", "delta_tot"))
    assert k.max() >= 2.0  # covers the requested k_max in 1/Mpc
    np.testing.assert_allclose(pk[0], 1e4 * (k / 0.05) ** -1.8, rtol=1e-10)
