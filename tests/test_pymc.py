"""PyMC frontend tests (marker: pymc).

Skipped in environments without pymc (like the TPU build image); they run
where pymc/pytensor are installed, mirroring the reference's
tests/test_pymc.py coverage of the jax backend path.
"""

import numpy as np
import pytest

pm = pytest.importorskip("pymc")

import nutpie_tpu  # noqa: E402
from nutpie_tpu import diagnostics  # noqa: E402

pytestmark = pytest.mark.pymc


def _simple_model():
    with pm.Model() as model:
        mu = pm.Normal("mu", sigma=10)
        sigma = pm.HalfNormal("sigma", sigma=1)
        pm.Normal("y", mu=mu, sigma=sigma,
                  observed=[1.0, 2.0, 1.5, 2.5, 1.8, 2.2])
    return model


def test_compile_and_sample():
    compiled = nutpie_tpu.compile_pymc_model(_simple_model())
    assert compiled.n_dim == 2
    trace = nutpie_tpu.sample(
        compiled, chains=2, draws=400, tune=300, seed=1, progress_bar=False
    )
    mu = np.asarray(trace.posterior["mu"].values)
    sigma = np.asarray(trace.posterior["sigma"].values)
    assert abs(mu.mean() - 1.83) < 0.5
    assert np.all(sigma > 0)
    assert diagnostics.rhat(mu) < 1.05


def test_deterministics_and_dims():
    coords = {"group": ["a", "b", "c"]}
    with pm.Model(coords=coords) as model:
        raw = pm.Normal("raw", dims="group")
        pm.Deterministic("doubled", 2 * raw, dims="group")
    compiled = nutpie_tpu.compile_pymc_model(model)
    trace = nutpie_tpu.sample(
        compiled, chains=2, draws=100, tune=100, seed=2, progress_bar=False
    )
    raw_v = np.asarray(trace.posterior["raw"].values)
    doubled = np.asarray(trace.posterior["doubled"].values)
    np.testing.assert_allclose(doubled, 2 * raw_v, rtol=1e-6)
    assert trace.posterior["raw"].dims == ("chain", "draw", "group")


def test_with_data():
    with pm.Model() as model:
        data = pm.Data("y_obs", np.array([1.0, 1.0, 1.0]))
        mu = pm.Normal("mu", sigma=10)
        pm.Normal("y", mu=mu, sigma=1, observed=data)
    compiled = nutpie_tpu.compile_pymc_model(model)
    t1 = nutpie_tpu.sample(compiled, chains=2, draws=300, tune=200, seed=3,
                           progress_bar=False)
    compiled2 = compiled.with_data(y_obs=np.array([5.0, 5.0, 5.0]))
    t2 = nutpie_tpu.sample(compiled2, chains=2, draws=300, tune=200, seed=3,
                           progress_bar=False)
    assert abs(np.asarray(t1.posterior["mu"].values).mean() - 1.0) < 0.5
    assert abs(np.asarray(t2.posterior["mu"].values).mean() - 5.0) < 0.5


def test_transformed_vars_grouped():
    with pm.Model() as model:
        pm.HalfNormal("s")
    compiled = nutpie_tpu.compile_pymc_model(model)
    trace = nutpie_tpu.sample(
        compiled, chains=2, draws=100, tune=100, seed=4, progress_bar=False,
        store_unconstrained=True,
    )
    assert "s" in trace.posterior
    assert np.all(np.asarray(trace.posterior["s"].values) > 0)


def test_compile_kwargs_validated():
    # invalid strategy/gradient_backend raise even before touching pymc
    # internals (pymc must be importable for compile to start, so these
    # only run where it exists)
    pytest.importorskip("pymc")
    import pymc as pm

    with pm.Model() as m:
        pm.Normal("x")
    import nutpie_tpu

    with pytest.raises(ValueError, match="initialization_strategy"):
        nutpie_tpu.compile_pymc_model(
            m, default_initialization_strategy="bogus"
        )
    with pytest.raises(ValueError, match="gradient_backend"):
        nutpie_tpu.compile_pymc_model(m, gradient_backend="numba")
