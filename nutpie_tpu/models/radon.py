"""Radon hierarchical model -- the headline benchmark model.

Reproduces the structure of the reference README's radon example
(``README.md:55-83``): intercept + ZeroSumNormal county effects scaled by a
HalfNormal sd, a global floor effect, a ZeroSumNormal county:floor
interaction, and a HalfNormal observation noise.  The original Minnesota
radon dataset is not redistributable here, so the default constructor
simulates a dataset with the same shape (919 observations, 85 counties,
floor indicator) from a fixed seed; pass ``log_radon``/``county_idx``/
``floor`` arrays to use real data.

Unconstrained parameterization (ndim = 4 + 2*(n_counties-1) + ... ):
ZeroSumNormal uses an orthonormal basis of the zero-sum subspace (n-1 free
parameters mapping isotropically onto the constrained n-vector, matching
PyMC's transform up to rotation); HalfNormal scales are sampled on the log
scale with the log-Jacobian added.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..model import ModelDef, make_model


def _zero_sum_basis(n: int) -> np.ndarray:
    """Orthonormal basis (n x n-1) of the sum-to-zero subspace."""
    # Householder reflection mapping e_1 -> 1/sqrt(n): columns 2..n form the basis
    v = np.full(n, 1.0 / np.sqrt(n))
    v[0] -= 1.0
    v /= np.linalg.norm(v)
    H = np.eye(n) - 2.0 * np.outer(v, v)
    return H[:, 1:]


def simulate_radon_data(seed: int = 42, n_obs: int = 919, n_counties: int = 85):
    rng = np.random.default_rng(seed)
    weights = rng.dirichlet(np.full(n_counties, 0.7))
    county_idx = rng.choice(n_counties, size=n_obs, p=weights)
    # make sure every county appears
    county_idx[:n_counties] = np.arange(n_counties)
    floor = (rng.random(n_obs) < 0.17).astype(np.float64)
    county_eff = 0.35 * rng.standard_normal(n_counties)
    county_eff -= county_eff.mean()
    county_floor_eff = 0.2 * rng.standard_normal(n_counties)
    county_floor_eff -= county_floor_eff.mean()
    mu = (
        1.3
        + county_eff[county_idx]
        - 0.6 * floor
        + county_floor_eff[county_idx] * floor
    )
    log_radon = mu + 0.75 * rng.standard_normal(n_obs)
    counties = [f"county_{i}" for i in range(n_counties)]
    return log_radon, county_idx, floor, counties


def radon(
    log_radon=None,
    county_idx=None,
    floor=None,
    counties=None,
    seed: int = 42,
    gather: str = "index",
) -> ModelDef:
    """Radon model; ``gather`` picks the county-lookup formulation.

    - ``"index"`` (default): ``county_effect[county_idx]`` -- an XLA gather,
      the natural form for the standard sampler path.
    - ``"onehot"``: the lookup is a matmul against a constant one-hot
      [n_obs, n_counties] matrix (and its transpose in the gradient).  Same
      density, MXU-friendly and free of gather/scatter ops, so the logp can
      trace inside a Pallas machine-step kernel (Mosaic lowers matmuls, not
      batched gathers).  Numerics differ from ``"index"`` only in summation
      order.
    """
    if log_radon is None:
        log_radon, county_idx, floor, counties = simulate_radon_data(seed)
    log_radon = np.asarray(log_radon, np.float64)
    county_idx = np.asarray(county_idx, np.int32)
    floor = np.asarray(floor, np.float64)
    n_obs = log_radon.shape[0]
    n_c = int(county_idx.max()) + 1
    if counties is None:
        counties = [f"county_{i}" for i in range(n_c)]

    basis = jnp.asarray(_zero_sum_basis(n_c))
    y = jnp.asarray(log_radon)
    cidx = jnp.asarray(county_idx)
    fl = jnp.asarray(floor)
    if gather == "onehot":
        onehot_np = np.zeros((n_obs, n_c))
        onehot_np[np.arange(n_obs), county_idx] = 1.0
        onehot = jnp.asarray(onehot_np)

        def _county_lookup(effect):
            return onehot @ effect

    elif gather == "index":

        def _county_lookup(effect):
            return effect[cidx]

    else:
        raise ValueError(f"unknown gather mode {gather!r}")

    # flat layout: intercept | county_raw_z (n_c-1) | log_county_sd |
    #              floor_effect | county_floor_raw_z (n_c-1) | log_cf_sd |
    #              log_sigma
    k = n_c - 1
    ndim = 5 + 2 * k
    s0 = 1
    s1 = s0 + k      # log_county_sd
    s2 = s1 + 1      # floor_effect
    s3 = s2 + 1      # county_floor_raw_z
    s4 = s3 + k      # log_cf_sd
    s5 = s4 + 1      # log_sigma

    def _halfnormal_logp(log_s, sigma):
        s = jnp.exp(log_s)
        return -0.5 * (s / sigma) ** 2 + log_s, s

    def _parts(q):
        intercept = q[0]
        raw_z = q[s0:s1]
        log_county_sd = q[s1]
        floor_effect = q[s2]
        cf_raw_z = q[s3:s4]
        log_cf_sd = q[s4]
        log_sigma = q[s5]
        county_raw = basis @ raw_z
        cf_raw = basis @ cf_raw_z
        return (
            intercept, raw_z, log_county_sd, floor_effect,
            cf_raw_z, log_cf_sd, log_sigma, county_raw, cf_raw,
        )

    def logp(q):
        (intercept, raw_z, log_county_sd, floor_effect,
         cf_raw_z, log_cf_sd, log_sigma, county_raw, cf_raw) = _parts(q)
        lp = -0.5 * (intercept / 10.0) ** 2
        lp += -0.5 * jnp.sum(raw_z * raw_z)
        lp += -0.5 * jnp.sum(cf_raw_z * cf_raw_z)
        lp_sd, county_sd = _halfnormal_logp(log_county_sd, 1.0)
        lp += lp_sd
        lp_cfsd, cf_sd = _halfnormal_logp(log_cf_sd, 1.0)
        lp += lp_cfsd
        lp += -0.5 * (floor_effect / 2.0) ** 2
        lp_sig, sigma = _halfnormal_logp(log_sigma, 1.5)
        lp += lp_sig
        county_effect = county_raw * county_sd
        cf_effect = cf_raw * cf_sd
        mu = (
            intercept
            + _county_lookup(county_effect)
            + floor_effect * fl
            + _county_lookup(cf_effect) * fl
        )
        resid = (y - mu) / sigma
        lp += -0.5 * jnp.sum(resid * resid) - n_obs * log_sigma
        return lp

    def expand(q):
        (intercept, raw_z, log_county_sd, floor_effect,
         cf_raw_z, log_cf_sd, log_sigma, county_raw, cf_raw) = _parts(q)
        county_sd = jnp.exp(log_county_sd)
        cf_sd = jnp.exp(log_cf_sd)
        return {
            "intercept": intercept,
            "county_raw": county_raw,
            "county_sd": county_sd,
            "county_effect": county_raw * county_sd,
            "floor_effect": floor_effect,
            "county_floor_raw": cf_raw,
            "county_floor_sd": cf_sd,
            "county_floor_effect": cf_raw * cf_sd,
            "sigma": jnp.exp(log_sigma),
        }

    f8 = np.float64
    return make_model(
        ndim,
        logp,
        expand_fn=expand,
        expanded_vars=[
            ("intercept", f8, (), None),
            ("county_raw", f8, (n_c,), ("county",)),
            ("county_sd", f8, (), None),
            ("county_effect", f8, (n_c,), ("county",)),
            ("floor_effect", f8, (), None),
            ("county_floor_raw", f8, (n_c,), ("county",)),
            ("county_floor_sd", f8, (), None),
            ("county_floor_effect", f8, (n_c,), ("county",)),
            ("sigma", f8, (), None),
        ],
        param_vars=[
            ("intercept", f8, (), None),
            ("county_raw_z", f8, (k,), ("county_zerosum",)),
            ("log_county_sd", f8, (), None),
            ("floor_effect", f8, (), None),
            ("county_floor_raw_z", f8, (k,), ("county_zerosum",)),
            ("log_county_floor_sd", f8, (), None),
            ("log_sigma", f8, (), None),
        ],
        coords={"county": list(counties)},
    )
