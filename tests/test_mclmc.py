"""MCLMC sampler tests."""

import numpy as np
import pytest

import nutpie_tpu
from nutpie_tpu.frontends.pyfunc import compile_model_def
from nutpie_tpu.models import std_normal


def test_mclmc_normal_moments():
    model = compile_model_def(std_normal(4, mu=2.0, sigma=1.5))
    trace = nutpie_tpu.sample(
        model, sampler="mclmc", chains=4, draws=2000, tune=600, seed=21,
        progress_bar=False,
    )
    x = np.asarray(trace.posterior["x"].values)
    assert x.shape == (4, 2000, 4)
    # MCLMC is asymptotically biased but tuned to small energy error
    assert abs(x.mean() - 2.0) < 0.15
    assert abs(x.std() - 1.5) < 0.2
    stats = trace.sample_stats
    assert "energy_error" in stats
    assert "step_size" in stats


def test_mclmc_determinism():
    model = compile_model_def(std_normal(2))
    kwargs = dict(sampler="mclmc", chains=2, draws=200, tune=200,
                  progress_bar=False)
    t1 = nutpie_tpu.sample(model, seed=5, **kwargs)
    t2 = nutpie_tpu.sample(model, seed=5, **kwargs)
    np.testing.assert_array_equal(
        np.asarray(t1.posterior["x"].values),
        np.asarray(t2.posterior["x"].values),
    )


def test_mclmc_fixed_step_size():
    model = compile_model_def(std_normal(2))
    trace = nutpie_tpu.sample(
        model, sampler="mclmc", chains=2, draws=100, tune=100, seed=2,
        progress_bar=False, dynamic_step_size=False, step_size=0.3,
    )
    eps = np.asarray(trace.sample_stats["step_size"].values)
    np.testing.assert_allclose(eps, 0.3)


@pytest.mark.parametrize("traj", ["euclidean", "euclidean_then_microcanonical"])
def test_mclmc_trajectory_kinds(traj):
    model = compile_model_def(std_normal(3, mu=1.0, sigma=2.0))
    trace = nutpie_tpu.sample(
        model, sampler="mclmc", chains=4, draws=1500, tune=500, seed=33,
        progress_bar=False, trajectory=traj,
    )
    x = np.asarray(trace.posterior["x"].values)
    assert abs(x.mean() - 1.0) < 0.2
    assert abs(x.std() - 2.0) < 0.3


def _correlated_gaussian(dim=8, factor=40.0, seed=0):
    import jax.numpy as jnp
    from nutpie_tpu.model import make_model

    rng = np.random.default_rng(seed)
    u = rng.standard_normal((dim, 1))
    u /= np.linalg.norm(u)
    cov = np.eye(dim) + factor * (u @ u.T)
    prec = jnp.asarray(np.linalg.inv(cov))

    def logp(x):
        return -0.5 * x @ prec @ x

    return make_model(
        dim, logp,
        param_vars=[("x", np.float64, (dim,), ("unconstrained_parameter",))],
    ), cov


def test_mclmc_low_rank():
    # a strongly correlated Gaussian: the low-rank preconditioner must
    # recover the factor direction's variance, which diag-preconditioned
    # MCLMC underestimates badly at equal budget
    model_def, cov = _correlated_gaussian()
    model = compile_model_def(model_def)
    trace = nutpie_tpu.sample(
        model, sampler="mclmc", adaptation="low_rank", chains=8, draws=3000,
        tune=1200, seed=11, progress_bar=False,
    )
    x = np.asarray(trace.posterior["x"].values).reshape(-1, 8)
    emp = np.var(x, axis=0)
    ratio = emp / np.diag(cov)
    assert ratio.min() > 0.5, ratio
    assert ratio.max() < 1.5, ratio


@pytest.mark.flow
def test_mclmc_flow():
    # scale-varying Gaussian: the flow's diagonal refit must absorb the
    # scales so base-space MCLMC mixes evenly
    model = compile_model_def(std_normal(4, mu=1.0, sigma=3.0))
    trace = nutpie_tpu.sample(
        model, sampler="mclmc", adaptation="flow", chains=4, draws=2000,
        tune=800, seed=17, progress_bar=False,
    )
    x = np.asarray(trace.posterior["x"].values)
    assert abs(x.mean() - 1.0) < 0.3
    assert abs(x.std() - 3.0) < 0.5
