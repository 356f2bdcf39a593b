"""End-to-end sampling tests: API surface, statistics, control plane.

Models the reference's test strategy (tests/test_pymc.py, tests/test_stan.py):
tiny real models, posterior-moment checks, stats presence, async control.
"""

import numpy as np
import pytest

import nutpie_tpu
from nutpie_tpu.frontends.pyfunc import compile_model_def
from nutpie_tpu.models import eight_schools, std_normal
from nutpie_tpu import diagnostics


@pytest.fixture(scope="module")
def normal_trace():
    model = compile_model_def(std_normal(3, mu=3.0, sigma=1.0))
    return nutpie_tpu.sample(
        model, chains=4, draws=600, tune=300, seed=42, progress_bar=False
    )


def test_normal_moments(normal_trace):
    # the Stan README model: x ~ normal(3, 1)
    x = np.asarray(normal_trace.posterior["x"].values)
    assert x.shape == (4, 600, 3)
    assert np.abs(x.mean() - 3.0) < 0.1
    assert np.abs(x.std() - 1.0) < 0.1


def test_basic_stats_present(normal_trace):
    stats = normal_trace.sample_stats
    for name in [
        "depth", "maxdepth_reached", "logp", "energy", "diverging",
        "step_size", "step_size_bar", "n_steps", "mean_tree_accept",
        "index_in_trajectory",
    ]:
        assert name in stats, name
    assert np.asarray(stats["diverging"].values).sum() == 0
    assert np.all(np.asarray(stats["step_size"].values) > 0)
    # settings JSON attached like the reference (sample.py:666-686)
    assert stats.attrs["inference_library"] == "nutpie_tpu"
    import json

    settings = json.loads(stats.attrs["inference_library_settings"])
    assert settings["settings"]["num_draws"] == 600


def test_warmup_groups(normal_trace):
    assert "warmup_posterior" in normal_trace.groups
    warm = np.asarray(normal_trace.warmup_posterior["x"].values)
    assert warm.shape == (4, 300, 3)


def test_no_warmup_group():
    model = compile_model_def(std_normal(1))
    trace = nutpie_tpu.sample(
        model, chains=2, draws=100, tune=100, seed=1,
        save_warmup=False, progress_bar=False,
    )
    assert "warmup_posterior" not in trace.groups


def test_seed_determinism():
    model = compile_model_def(std_normal(2))
    kwargs = dict(chains=2, draws=150, tune=150, progress_bar=False)
    t1 = nutpie_tpu.sample(model, seed=7, **kwargs)
    t2 = nutpie_tpu.sample(model, seed=7, **kwargs)
    t3 = nutpie_tpu.sample(model, seed=8, **kwargs)
    x1 = np.asarray(t1.posterior["x"].values)
    x2 = np.asarray(t2.posterior["x"].values)
    x3 = np.asarray(t3.posterior["x"].values)
    np.testing.assert_array_equal(x1, x2)
    assert not np.allclose(x1, x3)
    # chains must differ from each other
    assert not np.allclose(x1[0], x1[1])


def test_chunk_size_invariance():
    """Draws must not depend on the host chunking policy."""
    model = compile_model_def(std_normal(2))
    kwargs = dict(chains=2, draws=120, tune=80, seed=3, progress_bar=False)
    t1 = nutpie_tpu.sample(model, chunk_size=25, **kwargs)
    t2 = nutpie_tpu.sample(model, chunk_size=64, **kwargs)
    np.testing.assert_allclose(
        np.asarray(t1.posterior["x"].values),
        np.asarray(t2.posterior["x"].values),
    )


def test_store_options():
    model = compile_model_def(std_normal(2))
    trace = nutpie_tpu.sample(
        model, chains=2, draws=80, tune=80, seed=5, progress_bar=False,
        store_gradient=True, store_mass_matrix=True, store_divergences=True,
        store_unconstrained=True,
    )
    stats = trace.sample_stats
    for name in [
        "gradient", "mass_matrix_inv", "mass_matrix_stds",
        "divergence_start", "divergence_end", "divergence_momentum",
        "divergence_start_gradient", "unconstrained_draw",
    ]:
        assert name in stats, name
    grad = np.asarray(stats["gradient"].values)
    x = np.asarray(stats["unconstrained_draw"].values)
    # gradient of std normal is -x
    np.testing.assert_allclose(grad, -x, rtol=1e-10)


def test_eight_schools_convergence():
    model = compile_model_def(eight_schools())
    trace = nutpie_tpu.sample(
        model, chains=4, draws=800, tune=400, seed=10, progress_bar=False
    )
    mu = np.asarray(trace.posterior["mu"].values)
    tau = np.asarray(trace.posterior["tau"].values)
    assert mu.shape == (4, 800)
    r = diagnostics.rhat(mu)
    assert r < 1.02, r
    assert diagnostics.ess(mu) > 400
    assert 2.0 < mu.mean() < 7.0
    assert 1.0 < tau.mean() < 7.0
    theta = trace.posterior["theta"]
    assert theta.dims == ("chain", "draw", "school")


def test_draw_diag_adaptation():
    model = compile_model_def(std_normal(4, sigma=3.0))
    trace = nutpie_tpu.sample(
        model, chains=2, draws=300, tune=300, seed=2, progress_bar=False,
        adaptation="draw_diag", store_mass_matrix=True,
    )
    x = np.asarray(trace.posterior["x"].values)
    assert abs(x.std() - 3.0) < 0.35
    mm = np.asarray(trace.sample_stats["mass_matrix_inv"].values)
    # adapted mass matrix should approximate the posterior variance (9)
    assert np.all(np.abs(np.log(mm[:, -1] / 9.0)) < 1.5)


def test_target_accept():
    model = compile_model_def(std_normal(2))
    trace = nutpie_tpu.sample(
        model, chains=2, draws=400, tune=400, seed=4, progress_bar=False,
        target_accept=0.95,
    )
    acc = np.asarray(trace.sample_stats["mean_tree_accept"].values)
    assert abs(acc.mean() - 0.95) < 0.05


def test_maxdepth():
    model = compile_model_def(std_normal(2, sigma=100.0))
    trace = nutpie_tpu.sample(
        model, chains=2, draws=50, tune=50, seed=6, progress_bar=False,
        maxdepth=3, step_size_adapt_method="0.001",
    )
    depth = np.asarray(trace.sample_stats["depth"].values)
    n_steps = np.asarray(trace.sample_stats["n_steps"].values)
    assert depth.max() <= 3
    assert n_steps.max() <= 2**3
    assert np.asarray(trace.sample_stats["maxdepth_reached"].values).any()


def test_return_raw_trace():
    model = compile_model_def(std_normal(2))
    raw = nutpie_tpu.sample(
        model, chains=2, draws=50, tune=50, seed=1, progress_bar=False,
        return_raw_trace=True,
    )
    assert isinstance(raw, dict)
    assert raw["position"].shape == (2, 100, 2)


def test_init_failure_raises():
    import jax.numpy as jnp

    bad = nutpie_tpu.from_pyfunc(
        2, lambda: (lambda x: jnp.full((), -jnp.inf))
    )
    with pytest.raises(RuntimeError, match="initial position"):
        nutpie_tpu.sample(
            bad, chains=2, draws=10, tune=10, seed=1, progress_bar=False,
            num_try_init=3,
        )


def test_target_integration_time():
    # fixed step size 0.25, target time 2.0 -> depth limit ceil(log2(8)) = 3;
    # check_turning off isolates the time criterion (previously trajectories
    # would always run to maxdepth)
    model = compile_model_def(std_normal(2))
    trace = nutpie_tpu.sample(
        model, chains=2, draws=50, tune=50, seed=6, progress_bar=False,
        maxdepth=10, step_size_adapt_method="0.25", check_turning=False,
        target_integration_time=2.0,
    )
    depth = np.asarray(trace.sample_stats["depth"].values)
    assert depth.max() == 3
    assert depth.min() == 3

    # extra_doublings extends past the time-determined depth
    trace2 = nutpie_tpu.sample(
        model, chains=2, draws=50, tune=50, seed=6, progress_bar=False,
        maxdepth=10, step_size_adapt_method="0.25", check_turning=False,
        target_integration_time=2.0, extra_doublings=2,
    )
    depth2 = np.asarray(trace2.sample_stats["depth"].values)
    assert depth2.max() == 5

    # u-turn criterion still terminates earlier when enabled
    trace3 = nutpie_tpu.sample(
        model, chains=2, draws=50, tune=50, seed=6, progress_bar=False,
        maxdepth=10, step_size_adapt_method="0.25",
        target_integration_time=50.0,
    )
    depth3 = np.asarray(trace3.sample_stats["depth"].values)
    assert depth3.max() < 8


def test_microcanonical_trajectory():
    # NUTS trajectory_kind (reference KineticEnergyKind::Microcanonical,
    # wrapper.rs:590-608): isokinetic MAMS-style trajectories must still
    # recover the posterior, and the setting must change behavior (unit
    # whitened velocity => different trajectories from exact_normal)
    model = compile_model_def(std_normal(4, mu=0.5, sigma=1.5))
    trace = nutpie_tpu.sample(
        model, chains=4, draws=800, tune=400, seed=9, progress_bar=False,
        microcanonical_trajectory=True,
    )
    x = np.asarray(trace.posterior["x"].values)
    assert abs(x.mean() - 0.5) < 0.1
    assert abs(x.std() - 1.5) < 0.15
    div = np.asarray(trace.sample_stats["diverging"].values)
    assert div.mean() < 0.01

    trace2 = nutpie_tpu.sample(
        model, chains=4, draws=200, tune=400, seed=9, progress_bar=False,
    )
    x2 = np.asarray(trace2.posterior["x"].values)
    assert not np.allclose(x[:, :200], x2)


def test_microcanonical_low_rank():
    # micro kinetic composes with the low-rank metric (A u position update)
    from tests.test_low_rank import _correlated_gaussian

    model_def, _ = _correlated_gaussian(dim=6, rho=0.9)
    trace = nutpie_tpu.sample(
        compile_model_def(model_def), chains=4, draws=600, tune=400, seed=10,
        progress_bar=False, adaptation="low_rank",
        microcanonical_trajectory=True,
    )
    x = np.asarray(trace.posterior["x"].values)
    assert abs(x.mean()) < 0.6


def test_fleet_depth_cap():
    # cap = ceil(log2(depth_cap_factor * median steps/draw)), default
    # factor 2.0, clipped to [4, maxdepth]
    import jax.numpy as jnp

    from nutpie_tpu.sampler.nuts import (
        N_SCALAR_SLOTS, SCALAR_SLOTS, NutsConfig,
    )
    from nutpie_tpu.sampler.run import fleet_depth_cap

    class Bufs:
        pass

    bufs = Bufs()
    scal = jnp.full((4, 8, N_SCALAR_SLOTS), jnp.nan)
    # median steps/draw = 24 -> ceil(log2(2 * 24)) = 6
    scal = scal.at[:, :6, SCALAR_SLOTS["n_steps"]].set(24.0)
    bufs.scalars = scal
    cfg = NutsConfig(maxdepth=10)
    assert int(fleet_depth_cap(cfg, bufs, 6)) == 6
    # one outlier at maxdepth does not move the median-based cap
    scal = scal.at[0, :6, SCALAR_SLOTS["n_steps"]].set(1023.0)
    bufs.scalars = scal
    assert int(fleet_depth_cap(cfg, bufs, 6)) == 6
    # clipped to maxdepth when the fleet itself is deep
    scal = scal.at[:, :6, SCALAR_SLOTS["n_steps"]].set(1023.0)
    bufs.scalars = scal
    assert int(fleet_depth_cap(cfg, bufs, 6)) == 10


def test_f32_flow_recipe_defaulting():
    # float32 runs default flow training to the measured f32-stable recipe
    # (lr 3e-4, 1600 steps; results/README.md r4 hardware sweep); x64 runs
    # keep the faster x64 recipe; explicit user values always win.
    from nutpie_tpu.sample import _make_settings, _nuts_config_from_settings

    s = _make_settings("nuts", "flow", seed=0)
    s.precision = "float32"
    cfg = _nuts_config_from_settings(s)
    assert cfg.flow.learning_rate == pytest.approx(3e-4)
    assert cfg.flow.train_steps == 1600

    s = _make_settings("nuts", "flow", seed=0)
    s.precision = "float64"
    cfg = _nuts_config_from_settings(s)
    assert cfg.flow.learning_rate == pytest.approx(1e-3)
    assert cfg.flow.train_steps == 400

    # "auto" under the x64 test conftest resolves to float64
    s = _make_settings("nuts", "flow", seed=0)
    cfg = _nuts_config_from_settings(s)
    assert cfg.flow.train_steps == 400

    # explicit with_transform_adapt values beat the f32 default
    s = _make_settings("nuts", "flow", seed=0)
    s.precision = "float32"
    cfg = _nuts_config_from_settings(
        s, {"learning_rate": 7e-4, "train_steps": 800}
    )
    assert cfg.flow.learning_rate == pytest.approx(7e-4)
    assert cfg.flow.train_steps == 800

    # mclmc flow path gets the same defaulting
    from nutpie_tpu.sample import _mclmc_config_from_settings

    s = _make_settings("mclmc", "flow", seed=0)
    s.precision = "float32"
    cfg = _mclmc_config_from_settings(s)
    assert cfg.flow.learning_rate == pytest.approx(3e-4)
    assert cfg.flow.train_steps == 1600


def test_f32_flow_recipe_lr_decay_flag():
    from nutpie_tpu.sample import _make_settings, _nuts_config_from_settings

    s = _make_settings("nuts", "flow", seed=0)
    s.precision = "float32"
    assert _nuts_config_from_settings(s).flow.lr_decay is True
    s = _make_settings("nuts", "flow", seed=0)
    s.precision = "float64"
    assert _nuts_config_from_settings(s).flow.lr_decay is False
