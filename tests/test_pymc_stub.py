"""PyMC frontend executed end-to-end against the fake-pymc fixture.

pymc/pytensor are absent from this image, so ``frontends/pymc.py`` would
otherwise never run (VERDICT r2 #7).  ``fake_pymc.install`` provides the
minimal module surface the frontend imports; the graphs compute in real
JAX, so compilation, both gradient backends, and sampling run for real.
When real pymc IS installed the stub steps aside and these tests exercise
the real thing through the same code paths.
"""

import numpy as np
import pytest

import fake_pymc
import nutpie_tpu


@pytest.fixture()
def pymc_env(monkeypatch):
    fake_pymc.install(monkeypatch)
    yield


def _compiled(**kwargs):
    model, X, y, true_beta = fake_pymc.linear_regression_model()
    return nutpie_tpu.compile_pymc_model(model, **kwargs), X, y, true_beta


def test_compile_and_sample_e2e(pymc_env):
    compiled, X, y, true_beta = _compiled()
    assert compiled.n_dim == 4
    trace = nutpie_tpu.sample(
        compiled, chains=2, draws=400, tune=300, seed=0, progress_bar=False,
        store_unconstrained=True,
    )
    beta = np.asarray(trace.posterior["beta"].values)
    ols = np.linalg.lstsq(X, y, rcond=None)[0]
    np.testing.assert_allclose(beta.mean(axis=(0, 1)), ols, atol=0.15)
    sigma = np.asarray(trace.posterior["sigma"].values)
    assert (sigma > 0).all()
    assert abs(sigma.mean() - 0.3) < 0.15
    # deterministic with dims
    mu = trace.posterior["mu"]
    assert mu.dims[-1] == "obs"
    assert trace.posterior["beta"].dims[-1] == "coef"
    # the log-transformed value var lands in the unconstrained group
    assert "unconstrained_posterior" in trace.groups
    assert "sigma_log__" in trace.unconstrained_posterior.keys()


def test_gradient_backend_pytensor_matches_jax(pymc_env):
    import jax.numpy as jnp

    compiled_jax, *_ = _compiled(gradient_backend="jax")
    compiled_pt, *_ = _compiled(gradient_backend="pytensor")
    m_jax = compiled_jax._make_model(0)
    m_pt = compiled_pt._make_model(0)
    assert m_jax.logp_grad_fn is None
    assert m_pt.logp_grad_fn is not None
    x = jnp.asarray(np.random.default_rng(1).standard_normal(4))
    l1, g1 = m_jax.logp_and_grad(x)
    l2, g2 = m_pt.logp_and_grad(x)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-8)


def test_with_data_swap_and_shape_error(pymc_env):
    compiled, X, y, _ = _compiled()
    # a new dataset with the same shapes shifts the posterior
    rng = np.random.default_rng(7)
    y2 = X @ np.array([2.0, 2.0, 2.0]) + 0.3 * rng.standard_normal(len(y))
    swapped = compiled.with_data(y=y2)
    trace = nutpie_tpu.sample(
        swapped, chains=2, draws=300, tune=300, seed=1, progress_bar=False,
    )
    beta = np.asarray(trace.posterior["beta"].values).mean(axis=(0, 1))
    np.testing.assert_allclose(beta, [2.0, 2.0, 2.0], atol=0.2)
    # wrong shape raises at model build (reference tests/test_pymc.py:397-420)
    bad = compiled.with_data(y=np.zeros(3))
    with pytest.raises(ValueError, match="shape"):
        bad._make_model(0)


def test_var_names_filtering(pymc_env):
    compiled, *_ = _compiled(var_names=["beta"])
    model = compiled._make_model(0)
    names = [v.name for v in model.expanded_variables]
    assert names == ["beta"]
    # everything not expanded is reparameterized into the unconstrained group
    assert set(model.reparameterized_names) == {"sigma_log__"}


def test_initial_points_and_jitter_controls(pymc_env):
    import jax

    # adapt_diag: no jitter; initial point equals the base point exactly
    compiled, *_ = _compiled(
        initial_points={"sigma": 2.0},
        default_initialization_strategy="adapt_diag",
    )
    model = compiled._make_model(0)
    p1 = np.asarray(model.initial_position(jax.random.key(0), np.zeros(4)))
    p2 = np.asarray(model.initial_position(jax.random.key(1), np.zeros(4)))
    np.testing.assert_array_equal(p1, p2)
    assert abs(p1[3] - np.log(2.0)) < 1e-12  # override applied, transformed

    # jitter only the requested rv: beta slices move, sigma_log__ fixed
    compiled, *_ = _compiled(jitter_rvs=["beta"])
    model = compiled._make_model(0)
    q1 = np.asarray(model.initial_position(jax.random.key(0), np.zeros(4)))
    q2 = np.asarray(model.initial_position(jax.random.key(1), np.zeros(4)))
    assert not np.array_equal(q1[:3], q2[:3])
    assert q1[3] == q2[3]


def test_option_validation(pymc_env):
    model, *_ = fake_pymc.linear_regression_model()
    with pytest.raises(ValueError, match="jax"):
        nutpie_tpu.compile_pymc_model(model, backend="numba")
    with pytest.raises(ValueError, match="strategy"):
        nutpie_tpu.compile_pymc_model(
            model, default_initialization_strategy="nope"
        )
    with pytest.raises(ValueError, match="gradient_backend"):
        nutpie_tpu.compile_pymc_model(model, gradient_backend="numba")


def test_freeze_ordering_with_data(pymc_env):
    # with_data overrides apply BEFORE freezing (reference keeps this order;
    # freezing first would turn pm.Data into constants set_data cannot touch)
    import jax.numpy as jnp

    compiled, X, y, _ = _compiled(freeze_model=True)
    l_orig = float(compiled._make_model(0).logp_fn(jnp.zeros(4)))
    swapped = compiled.with_data(y=y * 2)
    model_def = swapped._make_model(0)
    assert compiled._model._frozen  # freeze happened at make-model time
    # the swapped data is live in the compiled logp
    l_swapped = float(model_def.logp_fn(jnp.zeros(4)))
    assert l_swapped != l_orig
