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
