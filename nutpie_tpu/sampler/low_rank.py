"""Low-rank modified diagonal mass matrix adaptation.

Implements the reference's experimental ``adaptation="low_rank"``
(settings ``mass_matrix_eigval_cutoff``/``mass_matrix_gamma``,
``wrapper.rs:307-334``; described at ``docs/sampling-options.qmd:118-137``):
the diagonal (gradient-based) estimate is extended with a low-rank update
capturing posterior correlations.

Estimator: working in the diagonally-standardized space, the posterior
covariance is estimated as the matrix geometric mean of the window's draw
covariance and inverse gradient covariance (the Fisher-divergence optimum,
Seyboldt et al.), restricted to the span of the last adaptation window's
draws and gradients:

1. project the (regularized) draw/grad covariances onto an orthonormal
   basis Q of the window span (rank <= 2*window);
2. solve the r x r geometric mean  S = A^{1/2}(A^{1/2} B^{-1} A^{1/2})^{1/2}
   ... implemented via  S = A^{1/2} (A^{1/2} B A^{1/2})^{-1/2} A^{1/2};
3. eigendecompose S, keep eigenvalues outside [1/cutoff, cutoff]
   (at most ``max_rank``), and store U = Q^T V, log(lambda).

The resulting metric is  M^{-1} = D^{1/2} (I + U (Lambda - I) U^T) D^{1/2},
applied in O(dim * rank) inside the leapfrog.  Unused rank slots are padded
with lambda = 1 (exact no-ops), keeping all shapes static.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LowRankMetric(NamedTuple):
    basis: jax.Array       # [dim, max_rank] orthonormal columns (padded 0)
    log_eigs: jax.Array    # [max_rank] log eigenvalues (padded 0 -> lambda 1)


def identity_metric(dim: int, max_rank: int, dtype) -> LowRankMetric:
    return LowRankMetric(
        basis=jnp.zeros((dim, max_rank), dtype),
        log_eigs=jnp.zeros((max_rank,), dtype),
    )


def lr_velocity(inv_mass: jax.Array, metric: LowRankMetric, p: jax.Array):
    """v = M^{-1} p = D^{1/2}(I + U(L-1)U^T)D^{1/2} p  -- O(dim*rank)."""
    s = jnp.sqrt(inv_mass)
    w = s * p
    coeff = (jnp.exp(metric.log_eigs) - 1.0) * (w @ metric.basis)
    return s * (w + metric.basis @ coeff)


def lr_velocity_rows(inv_mass: jax.Array, metric: LowRankMetric, P: jax.Array):
    """Row-batched velocity for the checkpoint turning checks ([k, dim])."""
    s = jnp.sqrt(inv_mass)
    W = P * s[None, :]
    coeff = (W @ metric.basis) * (jnp.exp(metric.log_eigs) - 1.0)[None, :]
    return (W + coeff @ metric.basis.T) * s[None, :]


def lr_sample_momentum(inv_mass: jax.Array, metric: LowRankMetric,
                       gauss: jax.Array):
    """p = M^{1/2} z with M^{1/2} = D^{-1/2}(I + U(L^{-1/2}-1)U^T)."""
    coeff = (jnp.exp(-0.5 * metric.log_eigs) - 1.0) * (gauss @ metric.basis)
    return (gauss + metric.basis @ coeff) / jnp.sqrt(inv_mass)


def estimate_low_rank(
    draws: jax.Array,     # [W, dim] window draws
    grads: jax.Array,     # [W, dim] window gradients
    valid: jax.Array,     # [W] bool validity mask
    inv_mass: jax.Array,  # [dim] diagonal estimate
    max_rank: int,
    eigval_cutoff: float,
    gamma: float,
) -> LowRankMetric:
    """Compute the low-rank correction from one adaptation window."""
    W, dim = draws.shape
    dtype = draws.dtype
    validf = valid.astype(dtype)[:, None]
    cnt = jnp.maximum(jnp.sum(validf), 2.0)

    s = jnp.sqrt(inv_mass)
    X = jnp.nan_to_num(draws / s[None, :]) * validf
    G = jnp.nan_to_num(grads * s[None, :]) * validf
    X = (X - jnp.sum(X, 0) / cnt) * validf
    G = (G - jnp.sum(G, 0) / cnt) * validf

    # orthonormal basis of the combined span (rank <= 2W)
    M = jnp.concatenate([X, G], axis=0)          # [2W, dim]
    q, _ = jnp.linalg.qr(M.T, mode="reduced")    # [dim, r], r = min(2W, dim)
    r = q.shape[1]

    Xq = X @ q                                   # [W, r]
    Gq = G @ q
    eye = jnp.eye(r, dtype=dtype)
    A = Xq.T @ Xq / (cnt - 1.0) + gamma * eye    # projected draw cov
    B = Gq.T @ Gq / (cnt - 1.0) + gamma * eye    # projected grad cov

    # geometric mean S = A^{1/2} (A^{1/2} B A^{1/2})^{-1/2} A^{1/2}
    wa, va = jnp.linalg.eigh(A)
    wa = jnp.maximum(wa, gamma)
    a_half = (va * jnp.sqrt(wa)[None, :]) @ va.T
    C = a_half @ B @ a_half
    wc, vc = jnp.linalg.eigh(C)
    wc = jnp.maximum(wc, gamma * gamma)
    c_inv_half = (vc * (wc ** -0.5)[None, :]) @ vc.T
    S = a_half @ c_inv_half @ a_half

    wl, vl = jnp.linalg.eigh(S)                  # ascending eigenvalues
    wl = jnp.maximum(wl, 1e-12)
    log_wl = jnp.log(wl)
    score = jnp.abs(log_wl)
    cut = jnp.log(eigval_cutoff)
    keepable = score > cut

    # choose the (up to max_rank) largest |log lambda| among keepable
    k = min(max_rank, r)
    order = jnp.argsort(-score)
    sel = order[:k]
    sel_keep = keepable[sel]
    sel_logw = jnp.where(sel_keep, log_wl[sel], 0.0)
    sel_vecs = jnp.where(sel_keep[None, :], vl[:, sel], 0.0)

    basis_full = q @ sel_vecs                    # [dim, k]
    if k < max_rank:
        pad = max_rank - k
        basis_full = jnp.concatenate(
            [basis_full, jnp.zeros((dim, pad), dtype)], axis=1
        )
        sel_logw = jnp.concatenate([sel_logw, jnp.zeros((pad,), dtype)])
    return LowRankMetric(basis=basis_full.astype(dtype),
                         log_eigs=sel_logw.astype(dtype))
