"""Low-rank mass matrix adaptation tests."""

import numpy as np
import jax.numpy as jnp
import pytest

import nutpie_tpu
from nutpie_tpu.frontends.pyfunc import compile_model_def
from nutpie_tpu.models import std_normal
from nutpie_tpu.model import make_model
from nutpie_tpu.sampler.low_rank import (
    estimate_low_rank,
    identity_metric,
    lr_sample_momentum,
    lr_velocity,
    lr_velocity_rows,
)


def _correlated_gaussian(dim=8, rho=0.95, seed=0):
    rng = np.random.default_rng(seed)
    # strong single-factor correlation structure
    u = rng.standard_normal((dim, 1))
    u /= np.linalg.norm(u)
    cov = np.eye(dim) + 40.0 * (u @ u.T)
    prec = jnp.asarray(np.linalg.inv(cov))

    def logp(x):
        return -0.5 * x @ prec @ x

    return make_model(
        dim, logp,
        param_vars=[("x", np.float64, (dim,), ("unconstrained_parameter",))],
    ), cov


def test_metric_ops_identity():
    dim, k = 6, 3
    metric = identity_metric(dim, k, jnp.float64)
    inv_mass = jnp.arange(1.0, dim + 1.0)
    p = jnp.arange(1.0, dim + 1.0)
    np.testing.assert_allclose(lr_velocity(inv_mass, metric, p), inv_mass * p)
    g = jnp.ones(dim)
    np.testing.assert_allclose(
        lr_sample_momentum(inv_mass, metric, g), g / jnp.sqrt(inv_mass)
    )
    P = jnp.stack([p, g])
    np.testing.assert_allclose(
        lr_velocity_rows(inv_mass, metric, P), P * inv_mass[None, :]
    )


def test_estimate_recovers_covariance():
    rng = np.random.default_rng(1)
    dim, W = 6, 64
    u = rng.standard_normal((dim, 1))
    u /= np.linalg.norm(u)
    cov = np.eye(dim) + 30.0 * (u @ u.T)
    chol = np.linalg.cholesky(cov)
    prec = np.linalg.inv(cov)
    draws = (chol @ rng.standard_normal((dim, W))).T
    grads = -(draws @ prec)
    metric = estimate_low_rank(
        jnp.asarray(draws), jnp.asarray(grads), jnp.ones(W, bool),
        jnp.ones(dim), max_rank=4, eigval_cutoff=2.0, gamma=1e-8,
    )
    # implied M^{-1} should approximate cov: check the dominant eigvec scale
    Minv = np.eye(dim) + (
        np.asarray(metric.basis)
        * (np.exp(np.asarray(metric.log_eigs)) - 1.0)[None, :]
    ) @ np.asarray(metric.basis).T
    top_true = np.linalg.eigvalsh(cov)[-1]
    top_est = np.linalg.eigvalsh(Minv)[-1]
    assert 0.5 * top_true < top_est < 2.0 * top_true


def test_low_rank_sampling_correlated():
    model_def, cov = _correlated_gaussian()
    model = compile_model_def(model_def)
    trace = nutpie_tpu.sample(
        model, chains=2, draws=800, tune=600, seed=8, progress_bar=False,
        adaptation="low_rank", mass_matrix_eigval_cutoff=3.0,
    )
    x = np.asarray(trace.posterior["x"].values)
    emp_cov = np.cov(x.reshape(-1, x.shape[-1]).T)
    # marginal variances should match the true covariance within ~35%
    ratio = np.diag(emp_cov) / np.diag(cov)
    assert np.all(ratio > 0.6) and np.all(ratio < 1.6), ratio
    # and mixing should be reasonable on the correlated direction
    from nutpie_tpu import diagnostics

    proj = x @ (np.linalg.eigh(cov)[1][:, -1])
    assert diagnostics.ess(proj) > 100


def test_low_rank_settings_validation():
    model = compile_model_def(std_normal(2))
    with pytest.raises(ValueError, match="not available for diag"):
        nutpie_tpu.sample(
            model, chains=1, draws=10, tune=10, progress_bar=False,
            adaptation="diag", mass_matrix_eigval_cutoff=3.0,
        )
