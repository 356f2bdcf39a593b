"""Masked per-chain row writes into chunk buffers.

The NUTS machine commits one row per chain into [chains, chunk, width]
buffers whenever that chain completes a draw.  Expressed as an XLA batched
scatter this miscompiles at large buffer sizes on the current TPU toolchain
(silently dropped rows with scatter-set, device faults with scatter-add --
observed at ~[2048, 64, 173] f32), and a Pallas row-DMA is blocked by
(8,128) tiling alignment on dynamically indexed HBM slices.  On TPU the
write is therefore expressed as a one-hot masked select over the buffer --
O(chains*chunk*width) memory traffic per step, but select/where lowers
reliably and aliases in place through the while loop.  Chunk lengths are
capped accordingly (see ``sample._default_chunk_size``).

On CPU/GPU the plain batched scatter is used (correct and cheap there).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _use_select() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


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
