"""Bit-equality of the pure-jnp Threefry against jax.random.

The machine-step megakernel regenerates the sampler's per-step uniforms
inside a Pallas kernel from raw uint32 key data (``ops/threefry.py``); the
streams MUST match ``jax.random`` exactly or XLA-path and kernel-path runs
(and the committed golden draws) would diverge.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nutpie_tpu.ops import threefry as tf


def _kd(key):
    return jax.random.key_data(key)


@pytest.mark.parametrize("seed", [0, 1, 42, 2**31 - 1, 123456789])
def test_fold_in_matches_jax(seed):
    key = jax.random.key(seed)
    for data in (0, 1, 3, 7, 1000, 2**31 - 1):
        ref = _kd(jax.random.fold_in(key, data))
        ours = tf.fold_in_data(_kd(key), data)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(ours))


@pytest.mark.parametrize("seed", [0, 5, 999])
def test_uniform3_matches_jax(seed):
    key = jax.random.key(seed)
    for step in (0, 1, 17, 4096):
        ku = jax.random.fold_in(jax.random.fold_in(key, 3), step)
        ref = jax.random.uniform(ku, (3,), jnp.float32)
        ours = tf.uniform3(tf.fold_in_data(tf.fold_in_data(_kd(key), 3), step))
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(ours))


def test_uniform3_batched():
    keys = jax.vmap(jax.random.key)(jnp.arange(32))
    kd = jax.vmap(jax.random.key_data)(keys)
    ref = jax.vmap(lambda k: jax.random.uniform(k, (3,), jnp.float32))(keys)
    ours = tf.uniform3(kd)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(ours))
    assert ours.shape == (32, 3)


def test_uniform1_matches_jax():
    for seed in (0, 3, 77):
        key = jax.random.fold_in(jax.random.key(seed), 9)
        ref = jax.random.uniform(key, (), jnp.float32)
        ours = tf.uniform1(tf.fold_in_data(_kd(jax.random.key(seed)), 9))
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(ours))


def test_machine_step_raw_key_bit_identical():
    """machine_step with raw uint32 key data reproduces the typed-key path
    exactly (the megakernel carries raw key data; streams must match)."""
    from functools import partial

    import numpy as onp

    from nutpie_tpu.models import radon
    from nutpie_tpu.sampler import AdaptConfig, NutsConfig
    from nutpie_tpu.sampler.adapt import make_schedule
    from nutpie_tpu.sampler.nuts import init_buffers, machine_step, start_draw
    from nutpie_tpu.sampler.run import init_chains

    chains, chunk = 4, 8
    model = radon()
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    cfg = NutsConfig(adapt=AdaptConfig(num_tune=100))
    sched = make_schedule(cfg.adapt, 100)
    states, _ = init_chains(
        model, cfg, 7, chains, np.zeros(model.ndim), dtype
    )
    dim = model.ndim
    mom = jax.vmap(
        lambda k: jax.vmap(
            lambda d: jax.random.normal(
                jax.random.fold_in(jax.random.fold_in(k, 1), d), (dim,), dtype
            )
        )(jnp.arange(chunk))
    )(states.rng_key)
    jit_u = jnp.full((chains, chunk), 0.5, dtype)
    bufs = init_buffers(cfg, chunk, dim, dtype, n_chains=chains)
    from nutpie_tpu.sampler.state import state_with

    states = state_with(states, done=False)
    states = jax.vmap(partial(start_draw, cfg, sched))(
        states, mom[:, 0], jit_u[:, 0]
    )

    def logp_and_grad(x, adapt):
        return model.logp_and_grad(x)

    step = jax.jit(jax.vmap(
        partial(machine_step, cfg, logp_and_grad),
        in_axes=(None, 0, 0, None, None, 0, 0),
    ), static_argnums=())

    def run(st, bf, nsteps=40):
        for _ in range(nsteps):
            st, bf = step(sched, mom, jit_u, 0, chunk, st, bf)
        return st, bf

    s_typed, b_typed = run(states, bufs)
    raw = states._replace(rng_key=jax.vmap(jax.random.key_data)(states.rng_key))
    s_raw, b_raw = run(raw, bufs)
    onp.testing.assert_array_equal(
        onp.asarray(s_typed.vecs), onp.asarray(s_raw.vecs)
    )
    onp.testing.assert_array_equal(
        onp.asarray(s_typed.ints), onp.asarray(s_raw.ints)
    )
    onp.testing.assert_array_equal(
        onp.asarray(b_typed.position), onp.asarray(b_raw.position)
    )
    onp.testing.assert_array_equal(
        onp.asarray(b_typed.scalars), onp.asarray(b_raw.scalars)
    )


def test_uniform_range():
    u = np.asarray(tf.uniform3(tf.fold_in_data(_kd(jax.random.key(7)), 11)))
    assert np.all(u >= 0.0) and np.all(u < 1.0)
