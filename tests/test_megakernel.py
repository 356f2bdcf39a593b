"""Megakernel (Pallas interpret mode) vs the XLA chunk runner.

Both paths execute the same ``machine_step`` trace: raw-key Threefry streams
are bit-equal to typed keys (test_threefry), the select row writes are
bit-equal to scatters (row-write probe semantics), and the one-hot radon
logp is shared.  The interpret-mode kernel must reproduce the XLA runner's
chunks to rounding error (XLA FMA-contracts the two programs differently;
observed ~1e-11 relative in f64) with EXACTLY equal integer decisions.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nutpie_tpu.models import radon
from nutpie_tpu.ops import row_write
from nutpie_tpu.sampler import AdaptConfig, NutsConfig
from nutpie_tpu.sampler.adapt import make_schedule
from nutpie_tpu.sampler.megakernel import (
    make_megakernel_chunk_runner,
    supports,
)
from nutpie_tpu.sampler.run import init_chains, make_chunk_runner


@pytest.fixture(scope="module")
def warm_fleet():
    chains, tune = 8, 64
    model = radon(gather="onehot")
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    cfg = NutsConfig(adapt=AdaptConfig(num_tune=tune))
    sched = make_schedule(cfg.adapt, tune)
    states, _ = init_chains(model, cfg, 5, chains, np.zeros(model.ndim), dtype)
    warm = make_chunk_runner(model, cfg, 32, dtype)
    start = 0
    while start < tune:
        states, _b = warm(states, start, min(32, tune - start), sched)
        start += 32
    snap = jax.tree_util.tree_map(jnp.copy, states)
    return model, cfg, sched, snap, dtype, tune


def _clone(t):
    return jax.tree_util.tree_map(jnp.copy, t)


def test_supports():
    cfg = NutsConfig(adapt=AdaptConfig(num_tune=10))
    assert supports(cfg)
    import dataclasses

    assert not supports(dataclasses.replace(cfg, store_divergences=True))


def test_megakernel_matches_xla_runner(warm_fleet):
    model, cfg, sched, snap, dtype, tune = warm_fleet
    chunk = 16

    with row_write.force_mode("select"):
        xla_run = make_chunk_runner(
            model, cfg, chunk, dtype, adapt_frozen=True
        )
        s_ref, b_ref = xla_run(_clone(snap), tune, chunk, sched)

    mk_run = make_megakernel_chunk_runner(
        model, cfg, chunk, dtype, tile=4, interpret=True
    )
    s_mk, b_mk = mk_run(_clone(snap), tune, chunk, sched)

    # Floats: the two paths are the same trace, but XLA compiles them as
    # different programs and FMA-contracts across different fusion
    # boundaries, so agreement is to rounding (observed ~1e-11 rel in f64),
    # not bitwise.  Integer decisions (tree shapes, step counts, draw
    # bookkeeping) must be EXACTLY equal over this horizon.
    np.testing.assert_allclose(
        np.asarray(b_ref.position), np.asarray(b_mk.position),
        rtol=1e-6, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(b_ref.scalars), np.asarray(b_mk.scalars),
        rtol=1e-6, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(s_ref.vecs), np.asarray(s_mk.vecs),
        rtol=1e-6, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(s_ref.flts), np.asarray(s_mk.flts),
        rtol=1e-6, atol=1e-8,
    )
    np.testing.assert_array_equal(
        np.asarray(s_ref.ints), np.asarray(s_mk.ints)
    )
    # typed keys survive the raw round trip
    np.testing.assert_array_equal(
        np.asarray(jax.vmap(jax.random.key_data)(s_ref.rng_key)),
        np.asarray(jax.vmap(jax.random.key_data)(s_mk.rng_key)),
    )


def test_megakernel_chains_not_multiple_of_tile(warm_fleet):
    model, cfg, sched, snap, dtype, tune = warm_fleet
    mk_run = make_megakernel_chunk_runner(
        model, cfg, 8, dtype, tile=3, interpret=True
    )
    with pytest.raises(ValueError, match="multiple"):
        mk_run(_clone(snap), tune, 8, sched)


def test_onehot_radon_matches_index_radon():
    m_idx = radon(gather="index")
    m_oh = radon(gather="onehot")
    rng = np.random.default_rng(0)
    for _ in range(5):
        q = jnp.asarray(0.3 * rng.standard_normal(m_idx.ndim))
        l1, g1 = m_idx.logp_and_grad(q)
        l2, g2 = m_oh.logp_and_grad(q)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-9)
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), rtol=1e-7, atol=1e-9
        )


def test_megakernel_warmup_matches_xla_runner():
    """adapt_frozen=False compiles the per-draw diag adaptation INTO the
    kernel; over one fresh warmup chunk the interpret-mode kernel must
    reproduce the XLA adapting runner: exact integer decisions and Welford
    counts, floats to rounding drift.  (One chunk only: the interpreter
    and the monolithic XLA program FMA-contract differently, and with
    adaptation ON the ~1e-11 per-step drift feeds back through the step
    size each draw, compounding to ~1e-5 by chunk end and flipping a
    discrete tree decision somewhere in chunk 2 -- chaos, not a semantic
    difference.)"""
    chains, tune, chunk = 8, 64, 16
    model = radon(gather="onehot")
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    cfg = NutsConfig(adapt=AdaptConfig(num_tune=tune))
    sched = make_schedule(cfg.adapt, tune)
    states, _ = init_chains(model, cfg, 7, chains, np.zeros(model.ndim), dtype)

    with row_write.force_mode("select"):
        xla_run = make_chunk_runner(model, cfg, chunk, dtype)
        s_ref, b_ref = xla_run(_clone(states), 0, chunk, sched)

    mk_run = make_megakernel_chunk_runner(
        model, cfg, chunk, dtype, tile=4, interpret=True, adapt_frozen=False
    )
    s_mk, b_mk = mk_run(_clone(states), 0, chunk, sched)

    np.testing.assert_array_equal(
        np.asarray(s_ref.ints), np.asarray(s_mk.ints)
    )
    np.testing.assert_array_equal(
        np.asarray(b_ref.n_steps), np.asarray(b_mk.n_steps)
    )
    # Welford counts are semantic (which draws entered the accumulators)
    np.testing.assert_array_equal(
        np.asarray(s_ref.adapt.draws_cur.count),
        np.asarray(s_mk.adapt.draws_cur.count),
    )
    np.testing.assert_allclose(
        np.asarray(b_ref.position), np.asarray(b_mk.position),
        rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(s_ref.adapt.inv_mass), np.asarray(s_mk.adapt.inv_mass),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(s_ref.adapt.da.log_step_bar),
        np.asarray(s_mk.adapt.da.log_step_bar), rtol=1e-4, atol=1e-6,
    )


def test_megakernel_opt_in_returns_fallback_off_tpu():
    # the kernel is opt-in (NUTPIE_TPU_MEGAKERNEL=1); by default -- and on
    # non-TPU backends even when opted in -- sample() keeps the XLA runner
    import os

    from nutpie_tpu.sample import _maybe_megakernel_runner

    cfg = NutsConfig(adapt=AdaptConfig(num_tune=10))
    sentinel = object()
    out = _maybe_megakernel_runner(
        radon(gather="onehot"), cfg, 16, jnp.float32, 64,
        pool_step=False, fallback=sentinel,
    )
    assert out is sentinel  # default: opt-in only
    os.environ["NUTPIE_TPU_MEGAKERNEL"] = "1"
    try:
        out = _maybe_megakernel_runner(
            radon(gather="onehot"), cfg, 16, jnp.float32, 64,
            pool_step=False, fallback=sentinel,
        )
        assert out is sentinel  # CPU backend in tests
    finally:
        del os.environ["NUTPIE_TPU_MEGAKERNEL"]
