"""Numeric-Jacobian checks for the Stan constraint transforms.

Each transform maps n unconstrained coordinates to a constrained value plus
a reported log|J|.  We extract a minimal coordinate chart of the constrained
manifold (the free components), differentiate u -> free(value) with jacfwd,
and compare slogdet against the reported log-Jacobian.  This is the test the
round-1 advisor asked for after the corr_matrix LL^T term was found missing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nutpie_tpu.frontends.stan import transforms as T

pytestmark = pytest.mark.stan


def _check(n, forward, free_coords, seed=0, scale=0.5):
    """Assert reported logJ == slogdet of d free_coords(value) / d u."""
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.normal(size=n) * scale)

    def f(u):
        value, _ = forward(u)
        return free_coords(value)

    jac = jax.jacfwd(f)(u)
    jac = jac.reshape(-1, n)
    assert jac.shape[0] == n, f"chart size {jac.shape[0]} != {n}"
    _, logdet = jnp.linalg.slogdet(jac)
    _, logj = forward(u)
    np.testing.assert_allclose(float(logj), float(logdet), rtol=1e-8, atol=1e-8)


def _strict_lower(m):
    k = m.shape[0]
    i, j = jnp.tril_indices(k, -1)
    return m[i, j]


def _lower_with_diag(m):
    k = m.shape[0]
    i, j = jnp.tril_indices(k)
    return m[i, j]


@pytest.mark.parametrize("k", [2, 3, 4, 6])
def test_cholesky_factor_corr_jacobian(k):
    n, fwd = T.cholesky_factor_corr(k)
    _check(n, fwd, _strict_lower, seed=k)


@pytest.mark.parametrize("k", [2, 3, 4, 6])
def test_corr_matrix_jacobian(k):
    n, fwd = T.corr_matrix(k)
    _check(n, fwd, _strict_lower, seed=k + 10)


@pytest.mark.parametrize("k", [2, 3, 4])
def test_cholesky_factor_cov_jacobian(k):
    n, fwd = T.cholesky_factor_cov(k)
    _check(n, fwd, _lower_with_diag, seed=k + 20)


@pytest.mark.parametrize("k", [2, 3, 4])
def test_cov_matrix_jacobian(k):
    n, fwd = T.cov_matrix(k)
    _check(n, fwd, _lower_with_diag, seed=k + 30)


@pytest.mark.parametrize("k", [3, 5])
def test_simplex_jacobian(k):
    n, fwd = T.simplex(k)
    _check(n, fwd, lambda v: v[: k - 1], seed=k + 40)


@pytest.mark.parametrize("k", [3, 5])
def test_ordered_jacobian(k):
    n, fwd = T.ordered(k)
    _check(n, fwd, lambda v: v, seed=k + 50)


@pytest.mark.parametrize("k", [3, 5])
def test_positive_ordered_jacobian(k):
    n, fwd = T.positive_ordered(k)
    _check(n, fwd, lambda v: v, seed=k + 60)


def test_lower_upper_jacobian():
    n, fwd = T.lower_upper((4,), -1.0, 2.5)
    _check(n, fwd, lambda v: v, seed=70)


def test_offset_multiplier_jacobian():
    n, fwd = T.offset_multiplier((3,), 1.0, 2.0)
    _check(n, fwd, lambda v: v, seed=71)


def test_lower_bound_jacobian():
    n, fwd = T.lower_bound((3,), 0.5)
    _check(n, fwd, lambda v: v, seed=72)


def test_upper_bound_jacobian():
    n, fwd = T.upper_bound((3,), 0.5)
    _check(n, fwd, lambda v: v, seed=73)
