"""Analytic test posteriors with known moments.

Each constructor returns a :class:`~nutpie_tpu.model.ModelDef`.  These map to
the reference's test fixtures and the driver benchmark configs
(BASELINE.json): the Stan README model ``x ~ normal(mu, sigma)``
(reference ``README.md:148-163``), Neal's funnel (``docs/nf-adapt.qmd``),
an ill-conditioned correlated Gaussian, and a logistic GLM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..model import ModelDef, make_model


def std_normal(dim: int = 1, mu: float = 0.0, sigma: float = 1.0) -> ModelDef:
    """Independent normals: the Stan README model generalized to ``dim``."""

    def logp(x):
        z = (x - mu) / sigma
        return -0.5 * jnp.sum(z * z)

    return make_model(
        dim,
        logp,
        param_vars=[("x", np.float64, (dim,), ("unconstrained_parameter",))],
    )


def funnel(dim: int = 10, scale: float = 3.0) -> ModelDef:
    """Neal's funnel: v ~ N(0, scale^2); x_i ~ N(0, exp(v/2)^2).

    The flow-adaptation acceptance gate model (reference
    ``docs/nf-adapt.qmd:75-101``).  ``dim`` counts the x block, so ndim is
    ``dim + 1`` with v first.
    """

    ndim = dim + 1

    def logp(q):
        v = q[0]
        x = q[1:]
        logp_v = -0.5 * (v / scale) ** 2
        # x_i ~ N(0, exp(v/2)^2)
        logp_x = -0.5 * jnp.sum(x * x) * jnp.exp(-v) - 0.5 * dim * v
        return logp_v + logp_x

    def expand(q):
        return {"v": q[0], "x": q[1:]}

    return make_model(
        ndim,
        logp,
        expand_fn=expand,
        expanded_vars=[
            ("v", np.float64, (), None),
            ("x", np.float64, (dim,), ("x_dim",)),
        ],
        param_vars=[
            ("v", np.float64, (), None),
            ("x", np.float64, (dim,), ("x_dim",)),
        ],
    )


def student_t_funnel(dim: int = 50, nu: float = 3.0,
                     scale: float = 3.0) -> ModelDef:
    """Heavy-tailed funnel: v ~ StudentT(nu, 0, scale);
    x_i ~ StudentT(nu, 0, exp(v/2)).

    The heavy-tail acceptance model (the regime the reference's sinh-asinh
    ``Contract`` bijections target, ``normalizing_flow.py:1218-1408``):
    polynomial tails in every direction PLUS funnel geometry, so both a
    diagonal metric and a Gaussian-tailed affine flow misfit the tails.
    ``dim`` counts the x block; ndim = dim + 1 with v first.
    """

    ndim = dim + 1
    half = 0.5 * (nu + 1.0)

    def t_logpdf_unit(z):
        # unnormalized StudentT(nu, 0, 1) log density
        return -half * jnp.log1p(z * z / nu)

    def logp(q):
        v = q[0]
        x = q[1:]
        logp_v = t_logpdf_unit(v / scale)
        # x_i ~ StudentT(nu, 0, exp(v/2)): scale family => subtract
        # dim * log(scale) = dim * v/2
        logp_x = jnp.sum(t_logpdf_unit(x * jnp.exp(-0.5 * v))) - 0.5 * dim * v
        return logp_v + logp_x

    def expand(q):
        return {"v": q[0], "x": q[1:]}

    return make_model(
        ndim,
        logp,
        expand_fn=expand,
        expanded_vars=[
            ("v", np.float64, (), None),
            ("x", np.float64, (dim,), ("x_dim",)),
        ],
        param_vars=[
            ("v", np.float64, (), None),
            ("x", np.float64, (dim,), ("x_dim",)),
        ],
    )


def hierarchical_funnel(groups: int = 8, dim: int = 8,
                        scale: float = 1.5) -> ModelDef:
    """Hierarchical funnel (BASELINE benchmark config "hierarchical funnel
    via nf-adapt"): a funnel of funnels.

    tau ~ N(0, scale^2); per-group v_g ~ N(0, exp(tau/2)^2);
    x_{g,i} ~ N(0, exp(v_g/2)^2).  Both hierarchy levels need the
    reparameterization a trained flow provides; diagonal mass matrices
    fail on the nested geometry.  ndim = 1 + groups + groups*dim with
    layout [tau, v_1..v_G, x_11..x_GK].
    """

    G, K = groups, dim
    ndim = 1 + G + G * K

    def logp(q):
        tau = q[0]
        v = q[1 : 1 + G]
        x = q[1 + G :].reshape(G, K)
        logp_tau = -0.5 * (tau / scale) ** 2
        logp_v = -0.5 * jnp.sum(v * v) * jnp.exp(-tau) - 0.5 * G * tau
        logp_x = (
            -0.5 * jnp.sum(jnp.sum(x * x, axis=1) * jnp.exp(-v))
            - 0.5 * K * jnp.sum(v)
        )
        return logp_tau + logp_v + logp_x

    def expand(q):
        return {
            "tau": q[0],
            "v": q[1 : 1 + G],
            "x": q[1 + G :].reshape(G, K),
        }

    return make_model(
        ndim,
        logp,
        expand_fn=expand,
        expanded_vars=[
            ("tau", np.float64, (), None),
            ("v", np.float64, (G,), ("group",)),
            ("x", np.float64, (G, K), ("group", "x_dim")),
        ],
        param_vars=[
            ("tau", np.float64, (), None),
            ("v", np.float64, (G,), ("group",)),
            ("x", np.float64, (G * K,), ("group_x",)),
        ],
    )


def ill_conditioned_gaussian(
    dim: int = 1000, condition: float = 1e4, seed: int = 0, correlate: bool = True
) -> ModelDef:
    """Zero-mean Gaussian with log-spaced eigenvalues and a random rotation.

    The mass-matrix adaptation stress test from BASELINE.json.  With
    ``correlate=False`` the covariance is diagonal (pure scale adaptation).
    """

    rng = np.random.default_rng(seed)
    eigs = np.logspace(0, np.log10(condition), dim)
    if correlate:
        q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
        # precision matrix P = Q diag(1/eigs) Q^T; logp = -0.5 x^T P x
        prec_half = q * (1.0 / np.sqrt(eigs))  # P = prec_half @ prec_half.T
        prec_half_j = jnp.asarray(prec_half)

        def logp(x):
            y = x @ prec_half_j
            return -0.5 * jnp.sum(y * y)

    else:
        inv_eigs = jnp.asarray(1.0 / eigs)

        def logp(x):
            return -0.5 * jnp.sum(x * x * inv_eigs)

    return make_model(
        dim,
        logp,
        param_vars=[("x", np.float64, (dim,), ("unconstrained_parameter",))],
    )


def eight_schools(centered: bool = False) -> ModelDef:
    """The eight-schools hierarchical model (non-centered by default)."""

    y = jnp.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
    sigma = jnp.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])

    def logp(q):
        mu, log_tau, theta_t = q[0], q[1], q[2:]
        tau = jnp.exp(log_tau)
        lp = -0.5 * (mu / 5.0) ** 2
        lp += -0.5 * (log_tau / 1.0) ** 2  # log-normal prior on tau
        if centered:
            theta = theta_t
            lp += jnp.sum(-0.5 * ((theta - mu) / tau) ** 2) - 8 * log_tau
        else:
            theta = mu + tau * theta_t
            lp += jnp.sum(-0.5 * theta_t**2)
        lp += jnp.sum(-0.5 * ((y - theta) / sigma) ** 2)
        return lp

    def expand(q):
        mu, log_tau, theta_t = q[0], q[1], q[2:]
        tau = jnp.exp(log_tau)
        theta = theta_t if centered else mu + tau * theta_t
        return {"mu": mu, "tau": tau, "theta": theta}

    return make_model(
        10,
        logp,
        expand_fn=expand,
        expanded_vars=[
            ("mu", np.float64, (), None),
            ("tau", np.float64, (), None),
            ("theta", np.float64, (8,), ("school",)),
        ],
        param_vars=[
            ("mu", np.float64, (), None),
            ("log_tau", np.float64, (), None),
            ("theta_raw", np.float64, (8,), ("school",)),
        ],
        coords={"school": list(range(8))},
        reparameterized_names=("theta_raw",) if not centered else (),
    )


def logistic_glm(
    n_data: int = 1024, dim: int = 64, seed: int = 0
) -> ModelDef:
    """Logistic regression with simulated data.

    The many-chain throughput benchmark (BASELINE.json: "10k+ chains
    sharded across pod slice").  The logp is one big matvec -- on TPU this
    rides the MXU when thousands of chains are batched.
    """

    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n_data, dim)).astype(np.float32)
    beta_true = rng.standard_normal(dim) / np.sqrt(dim)
    logits = X @ beta_true
    y = (rng.random(n_data) < 1.0 / (1.0 + np.exp(-logits))).astype(np.float32)
    Xj = jnp.asarray(X)
    yj = jnp.asarray(y)

    def logp(beta):
        logits = Xj @ beta.astype(Xj.dtype)
        # sum(y*logits - softplus(logits)); the stable softplus is written
        # SELECT-FREE as (x + |x|)/2 + log1p(exp(-|x|)) with |x| =
        # sqrt(x^2 + tiny) -- identical values to jax.nn.softplus (~1e-15
        # at x~0), but both jax.nn.softplus and max/abs lower their
        # GRADIENTS through boolean selects whose i1 layouts Mosaic cannot
        # transpose, and this logp must compile inside the Pallas
        # megakernel (forward and backward)
        ax = jnp.sqrt(logits * logits + 1e-30)
        softplus = 0.5 * (logits + ax) + jnp.log1p(jnp.exp(-ax))
        lp = jnp.sum(yj * logits - softplus)
        lp = lp.astype(beta.dtype) - 0.5 * jnp.sum(beta * beta)
        return lp

    return make_model(
        dim,
        logp,
        param_vars=[("beta", np.float64, (dim,), ("coef",))],
        coords={"coef": list(range(dim))},
    )
