"""Pure-jnp Threefry-2x32 matching ``jax.random`` bit-for-bit.

The NUTS machine consumes three uniforms per leapfrog step
(direction / multinomial / biased-progressive draws), derived as
``uniform(fold_in(fold_in(chain_key, 3), total_steps), (3,))``.  Inside a
Pallas TPU kernel ``jax.random`` primitives (typed keys, ``threefry2x32_p``)
do not lower, so the machine-step megakernel needs the same streams from
plain uint32 arithmetic.  This module reimplements exactly the subset used:

- ``threefry2x32(k1, k2, x0, x1)``: the 20-round hash
  (jax._src.prng._threefry2x32_lowering semantics, unrolled).
- ``fold_in_data(kd, data)``: ``jax.random.fold_in`` on raw ``uint32[2]``
  key data — hash of counts ``(0, data)`` (threefry_seed of a 32-bit value).
- ``uniform3(kd)``: ``jax.random.uniform(key, (3,), float32)`` under the
  default partitionable bit generator — per-element hash of
  ``(0, i)`` counts, xor-folded, mantissa-randomized into [1, 2) - 1.

Bit-equality against ``jax.random`` is asserted in
``tests/test_threefry.py``; the sampler's RNG streams (and therefore the
golden draw files) are identical whether a step runs through XLA or through
the megakernel.  Everything here is elementwise uint32 add/xor/shift — all
of which lower in Mosaic.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_ROT_A = (13, 15, 26, 6)
_ROT_B = (17, 29, 16, 24)


def _rotl(x, r: int):
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def threefry2x32(k1, k2, x0, x1):
    """20-round Threefry-2x32 hash of counts (x0, x1) under key (k1, k2).

    All inputs uint32 (arrays broadcast elementwise); returns (y0, y1).
    Matches ``jax._src.prng._threefry2x32_lowering`` exactly.
    """
    k1 = jnp.asarray(k1, jnp.uint32)
    k2 = jnp.asarray(k2, jnp.uint32)
    x0 = jnp.asarray(x0, jnp.uint32) + k1
    x1 = jnp.asarray(x1, jnp.uint32) + k2
    ks = (k1, k2, k1 ^ k2 ^ np.uint32(0x1BD11BDA))
    rots = (_ROT_A, _ROT_B)
    # 5 blocks of 4 rounds; key-schedule injection after each block
    for block in range(5):
        for r in rots[block % 2]:
            x0 = x0 + x1
            x1 = _rotl(x1, r)
            x1 = x0 ^ x1
        x0 = x0 + ks[(block + 1) % 3]
        x1 = x1 + ks[(block + 2) % 3] + np.uint32(block + 1)
    return x0, x1


def fold_in_data(kd, data):
    """``jax.random.fold_in`` on raw key data.

    ``kd``: uint32[..., 2] key data; ``data``: broadcastable integer.
    Returns uint32[..., 2].  Semantics: new key = threefry hash of the
    2-word count ``threefry_seed(uint32(data)) == (0, data)``.
    """
    kd = jnp.asarray(kd, jnp.uint32)
    data = jnp.asarray(data)
    d32 = data.astype(jnp.uint32)
    y0, y1 = threefry2x32(
        kd[..., 0], kd[..., 1], jnp.zeros_like(d32), d32
    )
    return jnp.stack([y0, y1], axis=-1)


def random_bits32(kd, counts_lo):
    """Partitionable 32-bit generator: bits for count indices ``counts_lo``.

    Matches ``jax.random.bits(key, shape)`` (equivalently the bit stage of
    ``uniform``) for flat indices < 2**32: per element, hash of
    ``(hi, lo) = (0, i)`` xor-folded.
    """
    kd = jnp.asarray(kd, jnp.uint32)
    lo = jnp.asarray(counts_lo, jnp.uint32)
    b0, b1 = threefry2x32(kd[..., 0], kd[..., 1], jnp.zeros_like(lo), lo)
    return b0 ^ b1


def bits_to_uniform(bits, dtype=jnp.float32):
    """Mantissa-randomization of uint32 bits into [0, 1) floats."""
    from jax import lax

    fb = (bits >> np.uint32(9)) | np.uint32(0x3F800000)
    return (
        lax.bitcast_convert_type(fb, jnp.float32) - np.float32(1.0)
    ).astype(dtype)


def uniform1(kd):
    """``jax.random.uniform(key, (), float32)`` from raw key data.

    Partitionable counts for a scalar shape are ``(0, 0)``.
    """
    kd = jnp.asarray(kd, jnp.uint32)
    bits = random_bits32(kd, jnp.zeros(kd.shape[:-1], jnp.uint32))
    return bits_to_uniform(bits)


def uniform3(kd):
    """``jax.random.uniform(key, (3,), float32)`` from raw key data.

    ``kd`` may be batched ``[..., 2]``; returns ``[..., 3]`` float32.
    """
    kd = jnp.asarray(kd, jnp.uint32)
    lo = jnp.broadcast_to(
        jnp.arange(3, dtype=jnp.uint32), kd.shape[:-1] + (3,)
    )
    bits = random_bits32(kd[..., None, 0:2], lo)
    return bits_to_uniform(bits)
