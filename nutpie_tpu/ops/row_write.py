"""Masked per-chain row writes into chunk buffers.

The NUTS machine commits one row per chain into [chains, chunk, width]
buffers whenever that chain completes a draw.  Three lowerings of the
batched op (identical values, very different TPU cost/reliability):

- **flat scatter**: reshape the buffer to [chains*chunk, width] and issue
  ONE scatter-set with global row indices ``c*chunk + idx[c]`` --
  O(chains*width) HBM traffic per machine step, and a different XLA:TPU
  lowering path (no scatter batching dims) than the one observed to
  miscompile.
- **batched scatter** (vmapped ``.at[idx].set(value, mode="drop")``): also
  O(chains*width), but on some TPU toolchains it MISCOMPILES at large
  buffer sizes (silently dropped rows with scatter-set, device faults with
  scatter-add -- observed at ~[2048, 64, 173] f32 on jax 0.9/axon in
  round 2), so it cannot be trusted blindly.
- **one-hot masked select** over the buffer: O(chains*chunk*width) traffic
  per step ON PAPER (the whole buffer is rewritten), but the dense update
  fuses into the while-loop body and double-buffers, so in practice it is
  the FASTEST lowering on TPU as well as the only one that is correct
  everywhere.

Strategy: TPU uses the one-hot select.  Measured on the radon bench shape
(2048 chains, v5e, jax 0.9/axon, round 4): select 4.34M posterior grads/s,
batched scatter 2.90M (and it MISCOMPILES at large buffers -- see above),
flat scatter 1.64M (XLA:TPU serializes the scatter; round 3 auto-probed it
first and silently cost the bench 2.6x).  CPU/GPU use batched scatter
(correct and cheap off-TPU).  ``NUTPIE_TPU_ROW_WRITE`` overrides (``flat``
/ ``scatter`` / ``select``) for experiments; the correctness probe below
guards any non-select choice.

The public :func:`masked_row_write` has UNBATCHED semantics and carries a
``jax.custom_batching.custom_vmap`` rule, so the per-chain sampler code
(vmapped over chains) transparently gets the probed batched lowering.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import custom_batching

# --------------------------------------------------------------- lowerings


def _batched_scatter(buf, idx, mask, value):
    """buf[c, idx[c]] = value[c] where mask[c] (batched over chains)."""
    L = buf.shape[1]
    ok = mask & (idx >= 0) & (idx < L)
    safe_idx = jnp.where(ok, idx, L)
    return jax.vmap(lambda b, j, v: b.at[j].set(v, mode="drop"))(
        buf, safe_idx, value
    )


def _flat_scatter(buf, idx, mask, value):
    """One global scatter into the [chains*L, ...] reshaped buffer."""
    C, L = buf.shape[0], buf.shape[1]
    # masked-off rows must go out of range GLOBALLY (a per-chain sentinel of
    # L would land in the next chain's row 0 after flattening)
    ok = mask & (idx >= 0) & (idx < L)
    rows = jnp.where(
        ok,
        jnp.arange(C, dtype=jnp.int32) * L + idx.astype(jnp.int32),
        C * L,
    )
    flat = buf.reshape((C * L,) + buf.shape[2:])
    flat = flat.at[rows].set(value, mode="drop")
    return flat.reshape(buf.shape)


def _select(buf, idx, mask, value):
    # Shape bookkeeping happens on i32 operands and the boolean is produced
    # directly at the broadcast rank: Mosaic cannot reshape i1 vectors
    # ("insertion of minor dim ... only supported for 32-bit types"), so
    # no bool array is ever reshaped here.
    L = buf.shape[1]
    C = buf.shape[0]
    trail = (1,) * (buf.ndim - 2)
    iota = jnp.arange(L, dtype=jnp.int32).reshape((1, L) + trail)
    idx_e = idx.astype(jnp.int32).reshape((C, 1) + trail)
    mask_e = jnp.asarray(mask).astype(jnp.int32).reshape((C, 1) + trail)
    onehot = (iota == idx_e) & (mask_e != 0)
    return jnp.where(onehot, value[:, None, ...], buf)


_IMPLS = {"flat": _flat_scatter, "scatter": _batched_scatter,
          "select": _select}


# ------------------------------------------------------------------ probe


def _probe(kind: str) -> bool:
    """Bench-shaped correctness probe of a batched lowering on this device.

    Mimics the production pattern exactly: a while-loop-carried
    [chains, chunk, width] f32 buffer receiving masked one-row-per-chain
    writes each iteration.  Returns True only when the device result is
    bit-identical to the numpy ground truth.
    """
    C, L, W = 2048, 64, 208
    impl = _IMPLS[kind]

    def step(i, buf):
        idx = (i + jnp.arange(C, dtype=jnp.int32)) % L
        mask = ((i + jnp.arange(C, dtype=jnp.int32)) % 3) != 0
        value = (
            (i * 1000 + jnp.arange(C, dtype=jnp.int32)).astype(jnp.float32)[
                :, None
            ]
            + jnp.arange(W, dtype=jnp.float32)[None, :]
        )
        return impl(buf, idx, mask, value)

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


# Trace-time override used while tracing code destined for a Pallas kernel
# body: Mosaic cannot lower batched scatters/gathers, so the megakernel
# forces the one-hot select lowering (cheap there -- the buffers involved
# are VMEM-resident).
_FORCED: list[str] = []


class force_mode:
    """Context manager forcing a row-write lowering during tracing."""

    def __init__(self, mode: str):
        assert mode in _IMPLS
        self.mode = mode

    def __enter__(self):
        _FORCED.append(self.mode)
        return self

    def __exit__(self, *exc):
        _FORCED.pop()
        return False


def _mode() -> str:
    if _FORCED:
        return _FORCED[-1]
    forced = os.environ.get("NUTPIE_TPU_ROW_WRITE")
    if forced in _IMPLS:
        return forced
    try:
        backend = jax.default_backend()
    except Exception:
        return "scatter"
    if backend != "tpu":
        return "scatter"
    # TPU: one-hot select -- the only lowering that is both correct at
    # every shape AND fastest at bench shape (see module docstring for the
    # measured rates; scatter lowerings serialize or miscompile on TPU)
    return "select"


def _use_select() -> bool:
    """Resolve the lowering eagerly (kept for call sites that pin the
    lowering choice outside a trace)."""
    return _mode() == "select"


# -------------------------------------------------------------- public op


@custom_batching.custom_vmap
def masked_row_write(buf, idx, mask, value):
    """Per-chain masked row write: buf[idx] = value where mask (else no-op).

    Unbatched semantics -- ``buf`` is [L] or [L, W], ``idx``/``mask`` are
    scalars, ``value`` matches ``buf[idx]``.  Out-of-range indices are
    dropped (no clipping) in every lowering.  Designed to be vmapped over
    the chains axis: the custom vmap rule swaps in the probed batched
    lowering (flat scatter / batched scatter / one-hot select).
    """
    L = buf.shape[0]
    value = jnp.asarray(value).astype(buf.dtype)
    safe_idx = jnp.where(mask & (idx >= 0) & (idx < L), idx, L)
    return buf.at[safe_idx].set(value, mode="drop")


@masked_row_write.def_vmap
def _masked_row_write_vmap(axis_size, in_batched, buf, idx, mask, value):
    buf_b, idx_b, mask_b, value_b = in_batched
    # the sampler always batches everything; broadcast stragglers for safety
    if not buf_b:
        buf = jnp.broadcast_to(buf[None], (axis_size,) + buf.shape)
    idx = jnp.broadcast_to(jnp.asarray(idx, jnp.int32), (axis_size,))
    mask = jnp.broadcast_to(jnp.asarray(mask), (axis_size,))
    value = jnp.asarray(value).astype(buf.dtype)
    if not value_b:
        value = jnp.broadcast_to(value[None], (axis_size,) + value.shape)
    return _IMPLS[_mode()](buf, idx, mask, value), True


@custom_batching.custom_vmap
def row_read(buf, idx):
    """Per-chain dynamic row read: ``buf[idx]`` (clipped).

    Unbatched semantics -- ``buf`` is [L] or [L, W], ``idx`` a scalar.
    Under vmap the lowering follows the active row-write mode: a batched
    gather normally (bit-identical to ``buf[idx]``), or a one-hot
    select-and-reduce under :class:`force_mode` ("select") for Pallas kernel
    bodies where Mosaic cannot lower batched gathers.
    """
    L = buf.shape[0]
    return buf[jnp.clip(idx, 0, L - 1)]


@row_read.def_vmap
def _row_read_vmap(axis_size, in_batched, buf, idx):
    buf_b, idx_b = in_batched
    if not buf_b:
        buf = jnp.broadcast_to(buf[None], (axis_size,) + buf.shape)
    idx = jnp.broadcast_to(jnp.asarray(idx, jnp.int32), (axis_size,))
    L = buf.shape[1]
    idx_c = jnp.clip(idx, 0, L - 1)
    if _mode() == "select":
        # jnp.where (not multiply) so NaN-initialized rows cannot leak
        # through 0 * NaN; the boolean is built at broadcast rank from i32
        # operands (Mosaic cannot reshape i1 vectors)
        C = buf.shape[0]
        trail = (1,) * (buf.ndim - 2)
        iota = jnp.arange(L, dtype=jnp.int32).reshape((1, L) + trail)
        idx_e = idx_c.astype(jnp.int32).reshape((C, 1) + trail)
        onehot = iota == idx_e
        masked = jnp.where(onehot, buf, jnp.zeros((), buf.dtype))
        return jnp.sum(masked, axis=1), True
    return jax.vmap(lambda b, j: b[j])(buf, idx_c), True
