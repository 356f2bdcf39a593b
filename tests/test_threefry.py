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


def test_uniform_range():
    u = np.asarray(tf.uniform3(tf.fold_in_data(_kd(jax.random.key(7)), 11)))
    assert np.all(u >= 0.0) and np.all(u < 1.0)
