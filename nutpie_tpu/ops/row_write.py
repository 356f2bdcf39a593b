"""Masked per-chain row writes into chunk buffers.

The NUTS machine commits one row per chain into [chains, chunk, width]
buffers whenever that chain completes a draw.  Two lowerings:

- **batched scatter** (`.at[idx].set(value, mode="drop")`): O(chains*width)
  HBM traffic per machine step -- the right op.  On some TPU toolchains it
  MISCOMPILES at large buffer sizes (silently dropped rows with
  scatter-set, device faults with scatter-add -- observed at
  ~[2048, 64, 173] f32 on jax 0.9/axon in round 2), so it cannot be
  trusted blindly.
- **one-hot masked select** over the buffer: O(chains*chunk*width) traffic
  per step (the whole buffer is rewritten), but lowers reliably and
  aliases in place through the while loop.  At the 2048-chain radon bench
  the dense commits are ~30% of HBM traffic, so this is the single
  biggest known overhead.

Strategy: on TPU, PROBE the device once per process -- run a bench-shaped
while-loop of masked batched scatter-sets and compare against the numpy
ground truth.  If the device scatters correctly, use scatter; on any
mismatch or error, fall back to select.  CPU/GPU always scatter.  The
probe result is cached per backend; ``NUTPIE_TPU_ROW_WRITE`` overrides
(``scatter`` / ``select``) for benchmarking both paths.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

_PROBED: dict[str, bool] = {}


def _batched_scatter(buf, idx, mask, value):
    """buf[c, idx[c]] = value[c] where mask[c] (batched over chains)."""
    L = buf.shape[1]
    safe_idx = jnp.where(mask, jnp.clip(idx, 0, L - 1), L)
    return jax.vmap(lambda b, j, v: b.at[j].set(v, mode="drop"))(
        buf, safe_idx, value
    )


def _scatter_probe() -> bool:
    """Bench-shaped correctness probe of batched scatter-set on this device.

    Mimics the production pattern exactly: a while-loop-carried
    [chains, chunk, width] f32 buffer receiving masked one-row-per-chain
    scatter-sets each iteration.  Returns True only when the device result
    is bit-identical to the numpy ground truth.
    """
    C, L, W = 2048, 64, 208

    def step(i, buf):
        idx = (i + jnp.arange(C, dtype=jnp.int32)) % L
        mask = ((i + jnp.arange(C, dtype=jnp.int32)) % 3) != 0
        value = (
            (i * 1000 + jnp.arange(C, dtype=jnp.int32)).astype(jnp.float32)[
                :, None
            ]
            + jnp.arange(W, dtype=jnp.float32)[None, :]
        )
        return _batched_scatter(buf, idx, mask, value)

    try:
        out = jax.jit(
            lambda: jax.lax.fori_loop(
                0, L, step, jnp.zeros((C, L, W), jnp.float32)
            )
        )()
        out = np.asarray(out)
    except Exception:
        return False

    ref = np.zeros((C, L, W), np.float32)
    cols = np.arange(C)
    wrow = np.arange(W, dtype=np.float32)
    for i in range(L):
        idx = (i + cols) % L
        mask = ((i + cols) % 3) != 0
        value = (i * 1000 + cols).astype(np.float32)[:, None] + wrow[None, :]
        sel = np.nonzero(mask)[0]
        ref[sel, idx[sel]] = value[sel]
    return bool(np.array_equal(out, ref))


def _use_select() -> bool:
    forced = os.environ.get("NUTPIE_TPU_ROW_WRITE")
    if forced == "select":
        return True
    if forced == "scatter":
        return False
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    if backend != "tpu":
        return False
    if backend not in _PROBED:
        _PROBED[backend] = _scatter_probe()
    return not _PROBED[backend]


def masked_row_write(buf, idx, mask, value):
    """Per-chain masked row write: buf[idx] = value where mask (else no-op).

    Unbatched semantics -- ``buf`` is [L] or [L, W], ``idx``/``mask`` are
    scalars, ``value`` matches ``buf[idx]``.  Designed to be vmapped over
    the chains axis.
    """
    L = buf.shape[0]
    value = jnp.asarray(value).astype(buf.dtype)
    if _use_select():
        onehot = (jnp.arange(L, dtype=jnp.int32) == idx) & mask
        if buf.ndim == 1:
            return jnp.where(onehot, value, buf)
        shape = (L,) + (1,) * (buf.ndim - 1)
        return jnp.where(onehot.reshape(shape), value[None, ...], buf)
    safe_idx = jnp.where(mask, jnp.clip(idx, 0, L - 1), L)
    return buf.at[safe_idx].set(value, mode="drop")
