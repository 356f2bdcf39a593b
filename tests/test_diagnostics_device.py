"""Device diagnostics vs the host implementations and scipy.

The on-device rank-normalized bulk ESS / Rhat (diagnostics_device) must
match the host module (diagnostics) exactly in algorithm -- including
average-rank tie handling, which matters because rejected MCMC draws
duplicate positions.  The rank normalization runs UNSTABLE sorts on TPU
(bench-critical: the final ESS reduction is ~15% of bench wall), which
this test pins as tie-safe.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tied_series(seed=0, c=8, n=400):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(c, n)).astype(np.float32)
    reps = rng.integers(0, 2, size=(c, n)).astype(bool)
    x = base.copy()
    # duplicate previous draw where reps -- mimics Metropolis rejections
    x[:, 1:][reps[:, 1:]] = x[:, :-1][reps[:, 1:]]
    return x


def test_rank_normalize_matches_scipy_with_ties():
    from scipy.stats import rankdata
    from jax.scipy.special import ndtri

    from nutpie_tpu.diagnostics_device import _rank_normalize

    x = _tied_series()
    z = np.asarray(_rank_normalize(jnp.asarray(x))).reshape(-1)
    flat = x.reshape(-1)
    r = rankdata(flat, method="average")
    z_ref = np.asarray(ndtri((r - 0.375) / (flat.size + 0.25)))
    # f32 ndtri tail precision only; rank errors would be >> 1e-3
    np.testing.assert_allclose(z, z_ref, atol=1e-4)


def test_device_ess_rhat_match_host():
    from nutpie_tpu import diagnostics as host
    from nutpie_tpu import diagnostics_device as dev

    x = _tied_series(seed=3)
    e_dev = float(dev.ess_bulk(jnp.asarray(x)))
    r_dev = float(dev.rhat(jnp.asarray(x)))
    e_host = float(host.ess_from_samples(x))
    r_host = float(host.rhat_from_samples(x))
    assert abs(e_dev - e_host) / e_host < 1e-3, (e_dev, e_host)
    assert abs(r_dev - r_host) < 1e-5, (r_dev, r_host)


def test_min_ess_over_columns():
    from nutpie_tpu.diagnostics_device import ess_bulk, min_ess_over_columns

    rng = np.random.default_rng(1)
    draws = rng.normal(size=(6, 300, 4)).astype(np.float32)
    # column 2 mixes terribly (high autocorrelation)
    slow = np.cumsum(rng.normal(size=(6, 300)), axis=1).astype(np.float32)
    draws[:, :, 2] = 0.02 * slow
    m = float(min_ess_over_columns(jnp.asarray(draws),
                                   jnp.arange(4, dtype=jnp.int32)))
    per_col = [float(ess_bulk(jnp.asarray(draws[:, :, j])))
               for j in range(4)]
    assert abs(m - min(per_col)) < 1e-3
    assert np.argmin(per_col) == 2
