"""SampleCollection: stats, RLE, txt round-trip, thin/skip, temperature."""

import numpy as np
import pytest

from cobaya_tpu.io.collection import SampleCollection


def make_coll(**kw):
    return SampleCollection(
        sampled_params=["a", "b"], derived_params=["d"],
        prior_names=["0"], like_names=["like"], **kw,
    )


def fill(coll, n=100, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 2))
    loglikes = -0.5 * (x**2).sum(1, keepdims=True)
    logpriors = np.full((n, 1), -1.0)
    derived = x.sum(1, keepdims=True)
    # a T-tempered sampler records logpost_T = (logprior + loglike)/T
    logpost = (loglikes.sum(1) + logpriors.sum(1)) / coll.temperature
    coll.append_batch(x, logpost, logpriors, loglikes, derived, rle=False)
    return x


def test_columns_schema():
    coll = make_coll()
    assert coll.columns == [
        "weight", "minuslogpost", "a", "b", "d",
        "minuslogprior", "minuslogprior__0", "chi2", "chi2__like",
    ]


def test_weighted_stats():
    coll = make_coll()
    x = fill(coll, 500)
    assert np.allclose(coll.mean(), x.mean(0), atol=1e-10)
    assert np.allclose(coll.cov(), np.cov(x.T), atol=1e-8)
    # derived included
    mu_d = coll.mean(derived=True)
    assert len(mu_d) == 3
    # second half
    mu2 = coll.mean(first=0.5)
    assert np.allclose(mu2, x[250:].mean(0), atol=1e-10)


def test_rle_weights():
    coll = make_coll()
    x = np.array([[1., 1.], [1., 1.], [2., 2.], [1., 1.]])
    loglikes = np.zeros((4, 1))
    logpriors = np.zeros((4, 1))
    derived = np.zeros((4, 1))
    coll.append_batch(x, np.zeros(4), logpriors, loglikes, derived, rle=True)
    assert len(coll) == 3
    assert list(coll.weights) == [2.0, 1.0, 1.0]


def test_txt_roundtrip(tmp_path):
    f = str(tmp_path / "chain.1.txt")
    coll = make_coll(file_name=f)
    fill(coll, 50)
    coll.out_update()
    # appending flushes only the new rows
    fill(coll, 25, seed=1)
    coll.out_update()
    loaded = SampleCollection.load(f)
    assert len(loaded) == 75
    assert np.allclose(loaded.data, coll.data, rtol=1e-7)


def test_skip_thin():
    coll = make_coll()
    fill(coll, 100)
    assert len(coll.skip_samples(0.25)) == 75
    thinned = coll.thin_samples(4)
    assert np.isclose(thinned.weights.sum(), 25)


def test_bestfit_map():
    coll = make_coll()
    fill(coll, 100)
    best = coll.bestfit()
    assert best[coll._icol("chi2")] == coll["chi2"].min()
    m = coll.MAP()
    assert m[1] == coll["minuslogpost"].min()


def test_detempering():
    coll = make_coll(temperature=2.0)
    x = fill(coll, 2000, seed=3)
    # chain samples p^(1/2): detempered weights are p^(1/2) (normalized),
    # with logpost_T the recorded (tempered) column
    w_det = coll._detempered_weights(slice(0, len(coll)))
    logpost_t = -coll["minuslogpost"]
    expected = np.exp((2 - 1) * (logpost_t - logpost_t.max()))
    assert np.allclose(w_det, expected)
    coll2 = coll.detempered_copy()
    assert coll2.temperature == 1
    assert np.allclose(coll2.weights, expected)
    # the copy's minuslogpost is the untempered -(logprior + loglike)
    assert np.allclose(coll2["minuslogpost"], 1.0 + 0.5 * coll2["chi2"])
    # batch detempering shares one normalization across chains
    c1 = make_coll(temperature=2.0)
    c2 = make_coll(temperature=2.0)
    fill(c1, 500, seed=5)
    fill(c2, 500, seed=6)
    c1.reset_temperature(with_batch=[c2])
    assert c1.temperature == 1 and c2.temperature == 1
    shift = max((-0.5 * np.asarray(c["chi2"]) - 1.0).max() / 2
                for c in (c1, c2))
    lp_t1 = (-0.5 * np.asarray(c1["chi2"]) - 1.0) / 2
    assert np.allclose(c1.weights, np.exp(lp_t1 - shift))


def test_reweight():
    coll = make_coll()
    fill(coll, 100)
    new = coll.reweight(np.linspace(0, 1, 100))
    assert len(new) == 99  # zero-weight row dropped
    assert len(coll) == 100  # original untouched


def test_native_formatter_matches_python():
    import time

    from cobaya_tpu.io import native

    rng = np.random.default_rng(0)
    rows = rng.normal(size=(200, 9)) * 10.0 ** rng.integers(-8, 8, (200, 9))
    rows[0, 0] = np.inf
    rows[1, 1] = -np.inf
    rows[2, 2] = 0.0
    text = native.format_rows(rows)
    if text is None:
        pytest.skip("no compiler available")
    expected = "\n".join(
        " ".join("%17.8g" % v for v in row) for row in rows
    ) + "\n"
    assert text == expected
    # throughput sanity: native beats python on a large block.  Warm up
    # first (the .so may be built/loaded lazily) and take best-of-3 so a
    # loaded machine doesn't flake the assertion.
    big = rng.normal(size=(20000, 20))
    native.format_rows(big)
    t_native = min(
        _timed(lambda: native.format_rows(big)) for _ in range(3)
    )
    t_python = min(
        _timed(lambda: "\n".join(
            " ".join("%17.8g" % v for v in row) for row in big[:2000]
        )) * 10 for _ in range(3)
    )
    assert t_native < t_python


def _timed(fn):
    import time

    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def test_get_stats():
    coll = make_coll()
    rng = np.random.default_rng(7)
    n = 5000
    x = rng.normal(loc=[1.0, -2.0], scale=[0.5, 2.0], size=(n, 2))
    coll.append_batch(x, np.zeros(n), np.zeros((n, 1)), np.zeros((n, 1)),
                      x.sum(1, keepdims=True), rle=False)
    stats = coll.get_stats(params=["a", "b"])
    assert abs(stats["a"]["mean"] - 1.0) < 0.03
    assert abs(stats["b"]["std"] - 2.0) < 0.1
    lo, hi = stats["a"]["cl95"]
    assert abs(lo - (1 - 1.96 * 0.5)) < 0.05
    assert abs(hi - (1 + 1.96 * 0.5)) < 0.05
