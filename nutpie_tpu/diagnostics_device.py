"""On-device convergence diagnostics (jax implementations).

Same algorithms as :mod:`nutpie_tpu.diagnostics` (rank-normalized
split-chain bulk ESS / Rhat, Vehtari et al. 2021) expressed in jnp so they
run on the accelerator over the full draw buffers.  This matters in two
places: benchmark harnesses (device->host readback of gigabyte draw
buffers can dwarf sampling itself on tunneled/remote device topologies)
and live convergence monitoring at chunk boundaries.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.special import ndtri


def _split_chains(x: jax.Array) -> jax.Array:
    c, n = x.shape
    half = n // 2
    return jnp.concatenate([x[:, :half], x[:, half : 2 * half]], axis=0)


def _rank_normalize(x: jax.Array) -> jax.Array:
    # Average ranks for ties (matches scipy rankdata(method="average") used
    # by the host implementation).  Implemented with sort + run-boundary
    # scans: jnp.searchsorted at multi-million-element sizes crashes the
    # XLA:TPU worker (observed at [4096, 1500] bench buffers), and
    # scatter-based alternatives hit the known batched-scatter miscompile
    # (ops/row_write.py), so neither appears here.
    #
    # Both sorts run UNSTABLE (saves the iota tie-break augmentation on
    # TPU; this reduction is ~15% of the whole bench wall).  Exactness is
    # unaffected: average ranks are computed from value runs, so every
    # member of a tie group receives the same rank no matter how the sort
    # ordered the group, and the inverse-permutation sort has unique
    # integer keys.
    shape = x.shape
    flat = x.reshape(-1)
    n = flat.size
    iota = jnp.arange(n, dtype=jnp.int32)
    # one sort yields both the sorted values and the ordering permutation
    sv, order = jax.lax.sort_key_val(flat, iota, is_stable=False)
    idx = jnp.arange(n)
    # first/last index of each run of equal values, broadcast over the run
    run_start = jnp.concatenate(
        [jnp.ones((1,), bool), sv[1:] != sv[:-1]]
    )
    first = jax.lax.cummax(jnp.where(run_start, idx, 0))
    run_end = jnp.concatenate([run_start[1:], jnp.ones((1,), bool)])
    last = jnp.flip(
        jax.lax.cummin(jnp.flip(jnp.where(run_end, idx, n - 1)))
    )
    # 1-based average rank of every element, in sorted order
    avg_rank_sorted = 0.5 * (first + last).astype(flat.dtype) + 1.0
    # un-permute: sorting (order, rank) pairs by the unique keys `order`
    # lands rank[j] at position order[j] -- the inverse permutation,
    # without a second full argsort + gather
    _, ranks = jax.lax.sort_key_val(order, avg_rank_sorted, is_stable=False)
    z = ndtri((ranks - 0.375) / (n + 0.25))
    return z.reshape(shape)


def _autocovariance(x: jax.Array) -> jax.Array:
    c, n = x.shape
    x = x - x.mean(axis=1, keepdims=True)
    m = 1 << max(1, (2 * n - 1)).bit_length()
    f = jnp.fft.rfft(x, m, axis=1)
    acov = jnp.fft.irfft(f * jnp.conj(f), m, axis=1)[:, :n].real
    return acov / n


def ess_bulk(x: jax.Array) -> jax.Array:
    """Bulk ESS of one scalar series [chains, draws] (device)."""
    x = _split_chains(jnp.asarray(x, jnp.result_type(float)))
    x = _rank_normalize(x)
    c, n = x.shape
    acov = _autocovariance(x)
    chain_var = acov[:, 0] * n / (n - 1.0)
    mean_var = jnp.mean(chain_var)
    var_plus = mean_var * (n - 1.0) / n + jnp.var(x.mean(axis=1), ddof=1)
    rho = 1.0 - (mean_var - jnp.mean(acov, axis=0)) / var_plus

    rho_even = rho[0::2]
    rho_odd = rho[1::2]
    k = min(rho_even.shape[0], rho_odd.shape[0])
    p = rho_even[:k] + rho_odd[:k]
    # Geyer initial positive + monotone sequence, vectorized:
    pos = p > 0
    first_nonpos = jnp.argmax(~pos)
    any_nonpos = jnp.any(~pos)
    t = jnp.where(any_nonpos, jnp.maximum(first_nonpos, 1), k)
    masked = jnp.where(jnp.arange(k) < t, p, jnp.inf)
    dec = jax.lax.associative_scan(jnp.minimum, masked)
    dec = jnp.where(jnp.arange(k) < t, dec, 0.0)
    tau = -1.0 + 2.0 * jnp.sum(dec)
    tau = jnp.maximum(tau, 1.0 / jnp.log10(c * n + 10.0))
    ess = c * n / tau
    ok = jnp.all(jnp.isfinite(x))
    return jnp.where(ok, ess, jnp.nan)


def rhat(x: jax.Array) -> jax.Array:
    """Rank-normalized split-Rhat of one scalar series [chains, draws]."""
    x = _split_chains(jnp.asarray(x, jnp.result_type(float)))
    x = _rank_normalize(x)
    c, n = x.shape
    chain_means = x.mean(axis=1)
    chain_vars = x.var(axis=1, ddof=1)
    between = n * jnp.var(chain_means, ddof=1)
    within = jnp.mean(chain_vars)
    var_plus = (n - 1.0) / n * within + between / n
    r = jnp.sqrt(var_plus / within)
    return jnp.where(jnp.all(jnp.isfinite(x)), r, jnp.nan)


@partial(jax.jit, static_argnames=("max_cols",))
def min_ess_over_columns(draws: jax.Array, cols: jax.Array,
                         max_cols: int = 32) -> jax.Array:
    """min bulk-ESS over selected columns of draws [chains, n, dim]."""
    sel = draws[:, :, cols[:max_cols]]
    esses = jax.vmap(ess_bulk, in_axes=2)(sel)
    return jnp.nanmin(esses)
