"""The reference's PyMC edge-case matrix, replicated against the fixture.

`/root/reference/tests/test_pymc.py` drives ~30 edge cases through real
pymc; pymc/pytensor are not installable in this image, so the same cases
run through ``tests/fake_pymc.py`` (real JAX graphs, fixture module
surface).  Each test names the reference test it mirrors:

- zero-size variables              (test_pymc.py:178-191)
- improper/Flat priors             (test_pymc.py:210-221)
- missing-data imputation shape    (test_pymc.py:520-530)
- non-identifier names + nested
  pm.Model prefixes                (test_pymc.py:380-394)
- C- vs F-ordered shared data      (test_pymc.py:84-113)
- float32 sampling                 (test_pymc.py:195-207)
- var_names excludes deterministics (test_pymc.py:423-468)
- auto-generated anonymous dims    (common.rs:302-379)
"""

import numpy as np
import pytest

import nutpie_tpu

pytestmark = pytest.mark.pymc
from nutpie_tpu.frontends.pymc import compile_pymc_model

from fake_pymc import FakeModel, install, linear_regression_model


@pytest.fixture
def pymc_env(monkeypatch):
    assert install(monkeypatch), "real pymc appeared; run these against it"
    yield


def _jnp():
    import jax.numpy as jnp

    return jnp


def test_zero_size_variable(pymc_env):
    """A shape-(0,) free RV occupies a zero-width slice of the flat
    vector and still appears in the trace (reference
    test_pymc.py:178-191)."""
    jnp = _jnp()

    def logp(env, data):
        return -0.5 * jnp.sum(env["a"] ** 2) - 0.5 * env["b"] ** 2

    model = FakeModel(dict(
        value_vars=[("a", (0,)), ("b", ())],
        free_rvs=["a", "b"],
        logp=logp,
        outputs=[("a", lambda env, data: env["a"]),
                 ("b", lambda env, data: env["b"])],
        initial={"a": np.zeros(0), "b": np.array(0.0)},
        data={},
    ))
    compiled = compile_pymc_model(model)
    assert compiled.n_dim == 1
    tr = nutpie_tpu.sample(compiled, chains=2, tune=100, draws=100, seed=0,
                           progress_bar=False)
    a = np.asarray(tr.posterior["a"].values)
    b = np.asarray(tr.posterior["b"].values)
    assert a.shape == (2, 100, 0)
    assert abs(b.mean()) < 0.3


def test_flat_prior_anchored_by_likelihood(pymc_env):
    """An improper flat prior (zero logp contribution) samples when the
    likelihood anchors it (reference test_pymc.py:210-221 uses pm.Flat)."""
    jnp = _jnp()
    y = np.array(1.5)

    def logp(env, data):
        # Flat prior on mu: no prior term at all
        return -0.5 * (jnp.asarray(data["y"]) - env["mu"]) ** 2

    model = FakeModel(dict(
        value_vars=[("mu", ())],
        free_rvs=["mu"],
        logp=logp,
        outputs=[("mu", lambda env, data: env["mu"])],
        initial={"mu": np.array(0.0)},
        data={"y": y},
    ))
    tr = nutpie_tpu.sample(compile_pymc_model(model), chains=2, tune=200,
                           draws=300, seed=0, progress_bar=False)
    mu = np.asarray(tr.posterior["mu"].values)
    assert abs(mu.mean() - 1.5) < 0.2
    assert abs(mu.std() - 1.0) < 0.25


def test_missing_data_imputation_analog(pymc_env):
    """Missing observations become free RVs; the expand function emits
    the combined observed+imputed vector (reference test_pymc.py:520-530:
    pm.Normal with masked data creates `y_unobserved` and a combined
    deterministic)."""
    jnp = _jnp()
    rng = np.random.default_rng(0)
    y_obs = rng.normal(2.0, 1.0, 8)
    obs_idx = np.arange(8)
    mis_idx = np.array([8, 9])

    def logp(env, data):
        mu = env["mu"]
        lp = -0.5 * jnp.sum((jnp.asarray(data["y_obs"]) - mu) ** 2)
        # imputed values are ordinary RVs with the same likelihood
        lp += -0.5 * jnp.sum((env["y_unobserved"] - mu) ** 2)
        lp += -0.5 * mu**2 / 100.0
        return lp

    def combined(env, data):
        out = jnp.zeros(10)
        out = out.at[obs_idx].set(jnp.asarray(data["y_obs"]))
        return out.at[mis_idx].set(env["y_unobserved"])

    model = FakeModel(dict(
        value_vars=[("mu", ()), ("y_unobserved", (2,))],
        free_rvs=["mu", "y_unobserved"],
        logp=logp,
        outputs=[("mu", lambda env, data: env["mu"]),
                 ("y_unobserved", lambda env, data: env["y_unobserved"]),
                 ("y", combined)],
        initial={"mu": np.array(0.0), "y_unobserved": np.zeros(2)},
        data={"y_obs": y_obs},
    ))
    tr = nutpie_tpu.sample(compile_pymc_model(model), chains=2, tune=200,
                           draws=300, seed=1, progress_bar=False)
    y_full = np.asarray(tr.posterior["y"].values)
    assert y_full.shape == (2, 300, 10)
    # observed entries pass through exactly; imputed entries track mu
    assert np.abs(y_full[..., :8] - y_obs).max() < 1e-6
    assert abs(y_full[..., 8:].mean() - y_obs.mean()) < 0.5


def test_non_identifier_names_and_nested_prefixes(pymc_env):
    """Variable names with spaces and nested-model `::` prefixes flow
    through compilation, sampling, and the trace unchanged (reference
    test_pymc.py:380-394)."""
    jnp = _jnp()

    def logp(env, data):
        return (-0.5 * env["a b"] ** 2
                - 0.5 * jnp.sum(env["sub::x"] ** 2))

    model = FakeModel(dict(
        value_vars=[("a b", ()), ("sub::x", (2,))],
        free_rvs=["a b", "sub::x"],
        logp=logp,
        outputs=[("a b", lambda env, data: env["a b"]),
                 ("sub::x", lambda env, data: env["sub::x"])],
        initial={"a b": np.array(0.0), "sub::x": np.zeros(2)},
        data={},
    ))
    tr = nutpie_tpu.sample(compile_pymc_model(model), chains=2, tune=100,
                           draws=150, seed=2, progress_bar=False)
    assert np.asarray(tr.posterior["a b"].values).shape == (2, 150)
    assert np.asarray(tr.posterior["sub::x"].values).shape == (2, 150, 2)


def test_fortran_ordered_shared_data(pymc_env):
    """with_data accepts F-ordered arrays and the posterior matches the
    C-ordered run (reference test_pymc.py:84-113)."""
    model, X, y, beta = linear_regression_model(N=30, K=2)
    compiled = compile_pymc_model(model)
    tr_c = nutpie_tpu.sample(compiled.with_data(X=np.ascontiguousarray(X)),
                             chains=2, tune=200, draws=200, seed=3,
                             progress_bar=False)
    model2, _, _, _ = linear_regression_model(N=30, K=2)
    tr_f = nutpie_tpu.sample(
        compile_pymc_model(model2).with_data(X=np.asfortranarray(X)),
        chains=2, tune=200, draws=200, seed=3, progress_bar=False)
    bc = np.asarray(tr_c.posterior["beta"].values)
    bf = np.asarray(tr_f.posterior["beta"].values)
    # identical seed + identical data bytes-in-different-order => same draws
    np.testing.assert_allclose(bc, bf, atol=1e-10)


def test_float32_sampling(pymc_env):
    """precision='float32' runs the fixture model end to end (reference
    test_pymc.py:195-207 floatX='float32')."""
    model, X, y, beta = linear_regression_model(N=20, K=2)
    tr = nutpie_tpu.sample(compile_pymc_model(model), chains=2, tune=200,
                           draws=200, seed=4, precision="float32",
                           progress_bar=False)
    b = np.asarray(tr.posterior["beta"].values)
    assert np.isfinite(b).all()
    assert np.abs(b.mean(axis=(0, 1)) - beta[:2]).max() < 0.4


def test_var_names_excludes_deterministic(pymc_env):
    """var_names filtering drops deterministics from the trace without
    touching sampling (reference test_pymc.py:423-468)."""
    model, X, y, beta = linear_regression_model(N=20, K=2)
    compiled = compile_pymc_model(model, var_names=["beta", "sigma"])
    tr = nutpie_tpu.sample(compiled, chains=1, tune=100, draws=100, seed=5,
                           progress_bar=False)
    assert "mu" not in tr.posterior
    assert "beta" in tr.posterior and "sigma" in tr.posterior


def test_anonymous_dims_autogenerated(pymc_env):
    """A dims entry shorter than the variable's rank falls back to
    auto-generated `{name}_dim_{i}` labels instead of mislabeling
    (reference common.rs:302-379 semantics)."""
    jnp = _jnp()

    def logp(env, data):
        return -0.5 * jnp.sum(env["m"] ** 2)

    model = FakeModel(dict(
        value_vars=[("m", (2, 3))],
        free_rvs=["m"],
        logp=logp,
        outputs=[("m", lambda env, data: env["m"])],
        initial={"m": np.zeros((2, 3))},
        data={},
        coords={"row": ["r0", "r1"]},
        dims={"m": ("row",)},  # rank mismatch: must not crash
    ))
    tr = nutpie_tpu.sample(compile_pymc_model(model), chains=1, tune=50,
                           draws=50, seed=6, progress_bar=False)
    assert np.asarray(tr.posterior["m"].values).shape == (1, 50, 2, 3)


def test_partial_dims_with_none_entries(pymc_env):
    """pymc's dims=("row", None): the None axis gets an auto-generated
    `{name}_dim_{i}` label while the named axis keeps its coords
    (reference common.rs:302-379)."""
    jnp = _jnp()

    def logp(env, data):
        return -0.5 * jnp.sum(env["m"] ** 2)

    model = FakeModel(dict(
        value_vars=[("m", (2, 3))],
        free_rvs=["m"],
        logp=logp,
        outputs=[("m", lambda env, data: env["m"])],
        initial={"m": np.zeros((2, 3))},
        data={},
        coords={"row": ["r0", "r1"]},
        dims={"m": ("row", None)},
    ))
    tr = nutpie_tpu.sample(compile_pymc_model(model), chains=1, tune=50,
                           draws=50, seed=7, progress_bar=False)
    m = tr.posterior["m"]
    assert np.asarray(m.values).shape == (1, 50, 2, 3)
    assert tuple(m.dims[-2:]) == ("row", "m_dim_1")
