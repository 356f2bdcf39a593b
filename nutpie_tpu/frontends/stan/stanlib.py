"""Stan math library and distribution implementations over jax.numpy.

Value conventions: scalars are 0-d, Stan ``vector`` is a 1-D array,
``row_vector`` is a 2-D ``(1, n)`` array, ``matrix`` is 2-D; array types
prepend leading axes.  Distributions return *elementwise* log densities
(including normalization constants); sampling statements sum them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy import special as jsp

from .errors import StanCompileError

_LOG_SQRT_2PI = 0.9189385332046727  # log(sqrt(2*pi))


def _as_f(x):
    return jnp.asarray(x, jnp.result_type(float))


# ----------------------------------------------------------------- densities

def normal_lpdf(y, mu, sigma):
    y, mu, sigma = _as_f(y), _as_f(mu), _as_f(sigma)
    z = (y - mu) / sigma
    return -0.5 * z * z - jnp.log(sigma) - _LOG_SQRT_2PI


def std_normal_lpdf(y):
    y = _as_f(y)
    return -0.5 * y * y - _LOG_SQRT_2PI


def normal_lcdf(y, mu, sigma):
    z = (_as_f(y) - mu) / sigma
    return jsp.log_ndtr(z)

def normal_lccdf(y, mu, sigma):
    z = (_as_f(y) - mu) / sigma
    return jsp.log_ndtr(-z)


def normal_cdf(y, mu, sigma):
    return jsp.ndtr((_as_f(y) - mu) / sigma)


def lognormal_lpdf(y, mu, sigma):
    y = _as_f(y)
    ly = jnp.log(y)
    z = (ly - mu) / sigma
    return -0.5 * z * z - jnp.log(sigma) - _LOG_SQRT_2PI - ly


def student_t_lpdf(y, nu, mu, sigma):
    y, nu, mu, sigma = _as_f(y), _as_f(nu), _as_f(mu), _as_f(sigma)
    z = (y - mu) / sigma
    return (
        jsp.gammaln((nu + 1) / 2)
        - jsp.gammaln(nu / 2)
        - 0.5 * jnp.log(nu * jnp.pi)
        - jnp.log(sigma)
        - (nu + 1) / 2 * jnp.log1p(z * z / nu)
    )


def cauchy_lpdf(y, mu, sigma):
    y, mu, sigma = _as_f(y), _as_f(mu), _as_f(sigma)
    z = (y - mu) / sigma
    return -jnp.log(jnp.pi) - jnp.log(sigma) - jnp.log1p(z * z)


def double_exponential_lpdf(y, mu, sigma):
    z = jnp.abs(_as_f(y) - mu) / sigma
    return -jnp.log(2.0) - jnp.log(sigma) - z


def logistic_lpdf(y, mu, sigma):
    z = (_as_f(y) - mu) / sigma
    return -z - jnp.log(sigma) - 2.0 * jax.nn.softplus(-z)


def gumbel_lpdf(y, mu, beta):
    z = (_as_f(y) - mu) / beta
    return -jnp.log(beta) - z - jnp.exp(-z)


def exponential_lpdf(y, lam):
    return jnp.log(lam) - lam * _as_f(y)


def gamma_lpdf(y, alpha, beta):
    y, alpha, beta = _as_f(y), _as_f(alpha), _as_f(beta)
    return (
        alpha * jnp.log(beta) - jsp.gammaln(alpha)
        + (alpha - 1) * jnp.log(y) - beta * y
    )


def inv_gamma_lpdf(y, alpha, beta):
    y, alpha, beta = _as_f(y), _as_f(alpha), _as_f(beta)
    return (
        alpha * jnp.log(beta) - jsp.gammaln(alpha)
        - (alpha + 1) * jnp.log(y) - beta / y
    )


def chi_square_lpdf(y, nu):
    y, nu = _as_f(y), _as_f(nu)
    return (
        (nu / 2 - 1) * jnp.log(y) - y / 2
        - (nu / 2) * jnp.log(2.0) - jsp.gammaln(nu / 2)
    )


def beta_lpdf(y, alpha, beta):
    y, alpha, beta = _as_f(y), _as_f(alpha), _as_f(beta)
    return (
        (alpha - 1) * jnp.log(y) + (beta - 1) * jnp.log1p(-y)
        - jsp.betaln(alpha, beta)
    )


def uniform_lpdf(y, lower, upper):
    y, lower, upper = _as_f(y), _as_f(lower), _as_f(upper)
    inside = (y >= lower) & (y <= upper)
    return jnp.where(inside, -jnp.log(upper - lower), -jnp.inf)


def weibull_lpdf(y, alpha, sigma):
    y, alpha, sigma = _as_f(y), _as_f(alpha), _as_f(sigma)
    z = y / sigma
    return (
        jnp.log(alpha) - jnp.log(sigma)
        + (alpha - 1) * jnp.log(z) - z**alpha
    )


def pareto_lpdf(y, y_min, alpha):
    y, y_min, alpha = _as_f(y), _as_f(y_min), _as_f(alpha)
    return jnp.log(alpha) + alpha * jnp.log(y_min) - (alpha + 1) * jnp.log(y)


def bernoulli_lpmf(y, theta):
    y, theta = _as_f(y), _as_f(theta)
    return y * jnp.log(theta) + (1 - y) * jnp.log1p(-theta)


def bernoulli_logit_lpmf(y, alpha):
    y, alpha = _as_f(y), _as_f(alpha)
    return y * alpha - jax.nn.softplus(alpha)


def binomial_lpmf(y, n, theta):
    y, n, theta = _as_f(y), _as_f(n), _as_f(theta)
    return (
        jsp.gammaln(n + 1) - jsp.gammaln(y + 1) - jsp.gammaln(n - y + 1)
        + y * jnp.log(theta) + (n - y) * jnp.log1p(-theta)
    )


def binomial_logit_lpmf(y, n, alpha):
    y, n, alpha = _as_f(y), _as_f(n), _as_f(alpha)
    return (
        jsp.gammaln(n + 1) - jsp.gammaln(y + 1) - jsp.gammaln(n - y + 1)
        + y * alpha - n * jax.nn.softplus(alpha)
    )


def poisson_lpmf(y, lam):
    y, lam = _as_f(y), _as_f(lam)
    return y * jnp.log(lam) - lam - jsp.gammaln(y + 1)


def poisson_log_lpmf(y, alpha):
    y, alpha = _as_f(y), _as_f(alpha)
    return y * alpha - jnp.exp(alpha) - jsp.gammaln(y + 1)


def neg_binomial_2_lpmf(y, mu, phi):
    y, mu, phi = _as_f(y), _as_f(mu), _as_f(phi)
    return (
        jsp.gammaln(y + phi) - jsp.gammaln(phi) - jsp.gammaln(y + 1)
        + phi * (jnp.log(phi) - jnp.log(phi + mu))
        + y * (jnp.log(mu) - jnp.log(phi + mu))
    )


def neg_binomial_2_log_lpmf(y, eta, phi):
    return neg_binomial_2_lpmf(y, jnp.exp(_as_f(eta)), phi)


def categorical_lpmf(y, theta):
    # y: int (or int array), theta: simplex vector
    y = jnp.asarray(y)
    logt = jnp.log(_as_f(theta))
    return jnp.take(logt, y - 1, axis=-1)


def categorical_logit_lpmf(y, beta):
    y = jnp.asarray(y)
    logp = jax.nn.log_softmax(_as_f(beta), axis=-1)
    return jnp.take(logp, y - 1, axis=-1)


def dirichlet_lpdf(theta, alpha):
    theta, alpha = _as_f(theta), _as_f(alpha)
    return (
        jnp.sum((alpha - 1) * jnp.log(theta), axis=-1)
        + jsp.gammaln(jnp.sum(alpha, axis=-1))
        - jnp.sum(jsp.gammaln(alpha), axis=-1)
    )


def multi_normal_lpdf(y, mu, Sigma):
    y, mu, Sigma = _as_f(y), _as_f(mu), _as_f(Sigma)
    d = y.shape[-1]
    chol = jnp.linalg.cholesky(Sigma)
    diff = y - mu
    z = jax.scipy.linalg.solve_triangular(chol, diff, lower=True)
    return (
        -0.5 * jnp.sum(z * z, axis=-1)
        - jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
        - 0.5 * d * jnp.log(2 * jnp.pi)
    )


def multi_normal_cholesky_lpdf(y, mu, L):
    y, mu, L = _as_f(y), _as_f(mu), _as_f(L)
    d = y.shape[-1]
    diff = y - mu
    z = jax.scipy.linalg.solve_triangular(L, diff, lower=True)
    return (
        -0.5 * jnp.sum(z * z, axis=-1)
        - jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
        - 0.5 * d * jnp.log(2 * jnp.pi)
    )


def lkj_corr_cholesky_lpdf(L, eta):
    L, eta = _as_f(L), _as_f(eta)
    K = L.shape[-1]
    diag = jnp.diagonal(L, axis1=-2, axis2=-1)
    exponents = K - jnp.arange(2, K + 1) + 2.0 * eta - 2.0
    # density over the cholesky factor (without the normalizing constant,
    # which does not depend on L)
    return jnp.sum(exponents * jnp.log(diag[..., 1:]), axis=-1)



def ordered_logistic_lpmf(y, eta, c):
    """Ordered logistic (Stan functions reference; K = len(c)+1 categories).

    log p(y=k) computed category-stably: edge categories via log_sigmoid,
    interior via sigmoid(a)-sigmoid(b) = sigmoid(b)*sigmoid(-a)*expm1(a-b)
    with a = eta - c_{k-1} > b = eta - c_k.
    """
    y = jnp.asarray(y)
    eta, c = _as_f(eta), jnp.atleast_1d(_as_f(c))
    K = c.shape[-1] + 1
    ls = jax.nn.log_sigmoid
    k = y - 1  # 0-based category
    c_lo = c[jnp.clip(k - 1, 0, K - 2)]
    c_hi = c[jnp.clip(k, 0, K - 2)]
    a = eta - c_lo
    b = eta - c_hi
    interior = ls(b) + ls(-a) + jnp.log(jnp.expm1(jnp.maximum(a - b, 1e-30)))
    first = ls(c[0] - eta)
    last = ls(eta - c[K - 2])
    return jnp.where(k <= 0, first, jnp.where(k >= K - 1, last, interior))


def multinomial_lpmf(y, theta):
    y, theta = _as_f(y), _as_f(theta)
    n = jnp.sum(y, axis=-1)
    # multiply_log semantics: 0 * log(0) == 0 so boundary simplex values
    # with y_i == 0 don't poison the logp (Stan's multinomial_lpmf does the
    # same via multiply_log).
    ylogt = jnp.where(y > 0, y * jnp.log(theta), 0.0)
    return (
        jsp.gammaln(n + 1) - jnp.sum(jsp.gammaln(y + 1), axis=-1)
        + jnp.sum(ylogt, axis=-1)
    )


def multinomial_logit_lpmf(y, gamma):
    return multinomial_lpmf(y, jax.nn.softmax(_as_f(gamma), axis=-1))


def beta_binomial_lpmf(y, n, alpha, beta):
    y, n, alpha, beta = _as_f(y), _as_f(n), _as_f(alpha), _as_f(beta)
    return (
        jsp.gammaln(n + 1) - jsp.gammaln(y + 1) - jsp.gammaln(n - y + 1)
        + jsp.betaln(y + alpha, n - y + beta) - jsp.betaln(alpha, beta)
    )


def von_mises_lpdf(y, mu, kappa):
    y, mu, kappa = _as_f(y), _as_f(mu), _as_f(kappa)
    # log I0(kappa) = log i0e(kappa) + kappa (scaled bessel, overflow-safe)
    return (
        kappa * jnp.cos(y - mu)
        - jnp.log(2 * jnp.pi) - (jnp.log(jsp.i0e(kappa)) + kappa)
    )


def skew_normal_lpdf(y, xi, omega, alpha):
    y, xi, omega, alpha = _as_f(y), _as_f(xi), _as_f(omega), _as_f(alpha)
    z = (y - xi) / omega
    return (
        jnp.log(2.0) - jnp.log(omega)
        - 0.5 * z * z - 0.5 * jnp.log(2 * jnp.pi)
        + jsp.log_ndtr(alpha * z)
    )


def frechet_lpdf(y, alpha, sigma):
    y, alpha, sigma = _as_f(y), _as_f(alpha), _as_f(sigma)
    z = sigma / y
    return jnp.log(alpha) - jnp.log(sigma) + (alpha + 1) * jnp.log(z) - z**alpha


def rayleigh_lpdf(y, sigma):
    y, sigma = _as_f(y), _as_f(sigma)
    return jnp.log(y) - 2 * jnp.log(sigma) - 0.5 * (y / sigma) ** 2


def lkj_corr_lpdf(y, eta):
    y, eta = _as_f(y), _as_f(eta)
    sign, logdet = jnp.linalg.slogdet(y)
    return (eta - 1.0) * logdet


def _mvgammaln(d, a):
    i = jnp.arange(d)
    return d * (d - 1) / 4.0 * jnp.log(jnp.pi) + jnp.sum(
        jsp.gammaln(a - i / 2.0)
    )


def wishart_lpdf(W, nu, S):
    W, nu, S = _as_f(W), _as_f(nu), _as_f(S)
    d = W.shape[-1]
    _, logdet_w = jnp.linalg.slogdet(W)
    chol_s = jnp.linalg.cholesky(S)
    logdet_s = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol_s)))
    x = jax.scipy.linalg.cho_solve((chol_s, True), W)
    tr = jnp.trace(x)
    return (
        0.5 * (nu - d - 1) * logdet_w - 0.5 * tr
        - 0.5 * nu * d * jnp.log(2.0) - 0.5 * nu * logdet_s
        - _mvgammaln(d, nu / 2.0)
    )


def inv_wishart_lpdf(W, nu, S):
    W, nu, S = _as_f(W), _as_f(nu), _as_f(S)
    d = W.shape[-1]
    _, logdet_w = jnp.linalg.slogdet(W)
    chol_s = jnp.linalg.cholesky(S)
    logdet_s = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol_s)))
    chol_w = jnp.linalg.cholesky(W)
    x = jax.scipy.linalg.cho_solve((chol_w, True), S)
    tr = jnp.trace(x)
    return (
        -0.5 * (nu + d + 1) * logdet_w - 0.5 * tr
        + 0.5 * nu * logdet_s - 0.5 * nu * d * jnp.log(2.0)
        - _mvgammaln(d, nu / 2.0)
    )


def multi_student_t_lpdf(y, nu, mu, Sigma):
    y, nu, mu, Sigma = _as_f(y), _as_f(nu), _as_f(mu), _as_f(Sigma)
    d = y.shape[-1]
    chol = jnp.linalg.cholesky(Sigma)
    diff = y - mu
    z = jax.scipy.linalg.solve_triangular(chol, diff, lower=True)
    q = jnp.sum(z * z, axis=-1)
    return (
        jsp.gammaln((nu + d) / 2.0) - jsp.gammaln(nu / 2.0)
        - 0.5 * d * jnp.log(nu * jnp.pi)
        - jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
        - 0.5 * (nu + d) * jnp.log1p(q / nu)
    )


def exp_mod_normal_lpdf(y, mu, sigma, lam):
    """Exponentially modified normal; the erfc tail goes through
    log_ndtr for stability (erfc(u) = 2*ndtr(-u*sqrt(2)))."""
    y, mu, sigma, lam = _as_f(y), _as_f(mu), _as_f(sigma), _as_f(lam)
    u = (mu + lam * sigma * sigma - y) / (jnp.sqrt(2.0) * sigma)
    return (
        jnp.log(lam) - jnp.log(2.0)
        + 0.5 * lam * (2.0 * mu + lam * sigma * sigma - 2.0 * y)
        + jnp.log(2.0) + jsp.log_ndtr(-u * jnp.sqrt(2.0))
    )


def skew_double_exponential_lpdf(y, mu, sigma, tau):
    y, mu, sigma, tau = _as_f(y), _as_f(mu), _as_f(sigma), _as_f(tau)
    z = y - mu
    cost = jnp.where(z >= 0, tau * z, (tau - 1.0) * z)
    return (
        jnp.log(2.0) + jnp.log(tau) + jnp.log1p(-tau) - jnp.log(sigma)
        - 2.0 * cost / sigma
    )


def beta_proportion_lpdf(theta, mu, kappa):
    mu, kappa = _as_f(mu), _as_f(kappa)
    return beta_lpdf(theta, mu * kappa, (1.0 - mu) * kappa)


def ordered_probit_lpmf(y, eta, c):
    """Latent-normal ordered model: P(y<=k) = Phi(c_k - eta)."""
    y = jnp.asarray(y)
    eta, c = _as_f(eta), jnp.atleast_1d(_as_f(c))
    z = c - (eta[..., None] if jnp.ndim(eta) else eta)
    cum = jsp.ndtr(z)
    pad0 = jnp.zeros(cum.shape[:-1] + (1,))
    pad1 = jnp.ones(cum.shape[:-1] + (1,))
    probs = jnp.diff(jnp.concatenate([pad0, cum, pad1], axis=-1), axis=-1)
    if probs.ndim == 1:
        return jnp.log(jnp.take(probs, y - 1))
    return jnp.log(
        jnp.take_along_axis(probs, (y - 1)[..., None], axis=-1)[..., 0]
    )


# ------------------------------------------------------- fused GLM densities
# Stan math's *_glm families (C++ fused likelihood+linear-predictor).  On
# TPU the fusion is the POINT: eta = alpha + x @ beta is one MXU matmul
# that XLA fuses with the elementwise density, so these are the preferred
# spellings for regression likelihoods at scale.

def _glm_eta(x, alpha, beta):
    return jnp.asarray(alpha) + jnp.asarray(x) @ jnp.ravel(_as_f(beta))


def normal_id_glm_lpdf(y, x, alpha, beta, sigma):
    return normal_lpdf(y, _glm_eta(x, alpha, beta), sigma)


def bernoulli_logit_glm_lpmf(y, x, alpha, beta):
    return bernoulli_logit_lpmf(y, _glm_eta(x, alpha, beta))


def poisson_log_glm_lpmf(y, x, alpha, beta):
    return poisson_log_lpmf(y, _glm_eta(x, alpha, beta))


def neg_binomial_2_log_glm_lpmf(y, x, alpha, beta, phi):
    return neg_binomial_2_log_lpmf(y, _glm_eta(x, alpha, beta), phi)


def ordered_logistic_glm_lpmf(y, x, beta, cuts):
    eta = jnp.asarray(x) @ jnp.ravel(_as_f(beta))
    return ordered_logistic_lpmf(y, eta, cuts)


def categorical_logit_glm_lpmf(y, x, alpha, beta):
    # x: [n, k]; beta: [k, K]; alpha: [K] -> eta: [n, K]
    eta = jnp.asarray(alpha)[None, :] + jnp.asarray(x) @ _as_f(beta)
    logp = jax.nn.log_softmax(eta, axis=-1)
    idx = (jnp.asarray(y) - 1).reshape(-1, 1)
    return jnp.take_along_axis(logp, idx, axis=-1)[:, 0]


DISTRIBUTIONS = {
    "normal": normal_lpdf,
    "std_normal": std_normal_lpdf,
    "lognormal": lognormal_lpdf,
    "student_t": student_t_lpdf,
    "cauchy": cauchy_lpdf,
    "double_exponential": double_exponential_lpdf,
    "logistic": logistic_lpdf,
    "gumbel": gumbel_lpdf,
    "exponential": exponential_lpdf,
    "gamma": gamma_lpdf,
    "inv_gamma": inv_gamma_lpdf,
    "chi_square": chi_square_lpdf,
    "beta": beta_lpdf,
    "uniform": uniform_lpdf,
    "weibull": weibull_lpdf,
    "pareto": pareto_lpdf,
    "bernoulli": bernoulli_lpmf,
    "bernoulli_logit": bernoulli_logit_lpmf,
    "binomial": binomial_lpmf,
    "binomial_logit": binomial_logit_lpmf,
    "poisson": poisson_lpmf,
    "poisson_log": poisson_log_lpmf,
    "neg_binomial_2": neg_binomial_2_lpmf,
    "neg_binomial_2_log": neg_binomial_2_log_lpmf,
    "categorical": categorical_lpmf,
    "categorical_logit": categorical_logit_lpmf,
    "dirichlet": dirichlet_lpdf,
    "multi_normal": multi_normal_lpdf,
    "multi_normal_cholesky": multi_normal_cholesky_lpdf,
    "lkj_corr_cholesky": lkj_corr_cholesky_lpdf,
    "ordered_logistic": ordered_logistic_lpmf,
    "multinomial": multinomial_lpmf,
    "multinomial_logit": multinomial_logit_lpmf,
    "beta_binomial": beta_binomial_lpmf,
    "von_mises": von_mises_lpdf,
    "skew_normal": skew_normal_lpdf,
    "frechet": frechet_lpdf,
    "rayleigh": rayleigh_lpdf,
    "lkj_corr": lkj_corr_lpdf,
    "wishart": wishart_lpdf,
    "inv_wishart": inv_wishart_lpdf,
    "multi_student_t": multi_student_t_lpdf,
    "exp_mod_normal": exp_mod_normal_lpdf,
    "skew_double_exponential": skew_double_exponential_lpdf,
    "beta_proportion": beta_proportion_lpdf,
    "ordered_probit": ordered_probit_lpmf,
    "normal_id_glm": normal_id_glm_lpdf,
    "bernoulli_logit_glm": bernoulli_logit_glm_lpmf,
    "poisson_log_glm": poisson_log_glm_lpmf,
    "neg_binomial_2_log_glm": neg_binomial_2_log_glm_lpmf,
    "ordered_logistic_glm": ordered_logistic_glm_lpmf,
    "categorical_logit_glm": categorical_logit_glm_lpmf,
}

# distributions whose lpdf reduces over the last axis (not elementwise)
_MULTIVARIATE = {
    "dirichlet", "multi_normal", "multi_normal_cholesky", "lkj_corr_cholesky",
    "multinomial", "multinomial_logit", "lkj_corr", "wishart", "inv_wishart",
    "multi_student_t",
}

def exponential_lcdf(y, lam):
    return jnp.log1p(-jnp.exp(-lam * _as_f(y)))


def exponential_lccdf(y, lam):
    return -lam * _as_f(y)


def uniform_lcdf(y, lo, hi):
    return jnp.log((_as_f(y) - lo) / (hi - lo))


def uniform_lccdf(y, lo, hi):
    return jnp.log((hi - _as_f(y)) / (hi - lo))


def logistic_lcdf(y, mu, sigma):
    return jax.nn.log_sigmoid((_as_f(y) - mu) / sigma)


def logistic_lccdf(y, mu, sigma):
    return jax.nn.log_sigmoid(-(_as_f(y) - mu) / sigma)


def cauchy_lcdf(y, mu, sigma):
    z = (_as_f(y) - mu) / sigma
    return jnp.log(0.5 + jnp.arctan(z) / jnp.pi)


def cauchy_lccdf(y, mu, sigma):
    z = (_as_f(y) - mu) / sigma
    return jnp.log(0.5 - jnp.arctan(z) / jnp.pi)


def lognormal_lcdf(y, mu, sigma):
    return jsp.log_ndtr((jnp.log(_as_f(y)) - mu) / sigma)


def lognormal_lccdf(y, mu, sigma):
    return jsp.log_ndtr(-(jnp.log(_as_f(y)) - mu) / sigma)


def gumbel_lcdf(y, mu, beta):
    return -jnp.exp(-(_as_f(y) - mu) / beta)


def gumbel_lccdf(y, mu, beta):
    return jnp.log1p(-jnp.exp(-jnp.exp(-(_as_f(y) - mu) / beta)))


def weibull_lcdf(y, alpha, sigma):
    return jnp.log1p(-jnp.exp(-((_as_f(y) / sigma) ** alpha)))


def weibull_lccdf(y, alpha, sigma):
    return -((_as_f(y) / sigma) ** alpha)


def gamma_lcdf(y, alpha, beta):
    return jnp.log(jsp.gammainc(alpha, beta * _as_f(y)))


def gamma_lccdf(y, alpha, beta):
    return jnp.log1p(-jsp.gammainc(alpha, beta * _as_f(y)))


def student_t_lcdf(y, nu, mu, sigma):
    z = (_as_f(y) - mu) / sigma
    x = nu / (nu + z * z)
    tail = 0.5 * jsp.betainc(nu / 2.0, 0.5, x)
    return jnp.log(jnp.where(z > 0, 1.0 - tail, tail))


def student_t_lccdf(y, nu, mu, sigma):
    z = (_as_f(y) - mu) / sigma
    x = nu / (nu + z * z)
    tail = 0.5 * jsp.betainc(nu / 2.0, 0.5, x)
    return jnp.log(jnp.where(z > 0, tail, 1.0 - tail))


# lcdf/lccdf lookups for truncation
LCDFS = {
    "normal": normal_lcdf,
    "exponential": exponential_lcdf,
    "uniform": uniform_lcdf,
    "logistic": logistic_lcdf,
    "cauchy": cauchy_lcdf,
    "lognormal": lognormal_lcdf,
    "gumbel": gumbel_lcdf,
    "weibull": weibull_lcdf,
    "gamma": gamma_lcdf,
    "student_t": student_t_lcdf,
}
LCCDFS = {
    "normal": normal_lccdf,
    "exponential": exponential_lccdf,
    "uniform": uniform_lccdf,
    "logistic": logistic_lccdf,
    "cauchy": cauchy_lccdf,
    "lognormal": lognormal_lccdf,
    "gumbel": gumbel_lccdf,
    "weibull": weibull_lccdf,
    "gamma": gamma_lccdf,
    "student_t": student_t_lccdf,
}


# ------------------------------------------------------------ rng functions

def _bshape(*args):
    return jnp.broadcast_shapes(*(jnp.shape(a) for a in args))


def _von_mises_rng(key, mu, kappa):
    """Best & Fisher (1979) rejection sampler, vectorized + jit-safe."""
    shape = _bshape(mu, kappa)
    mu = jnp.broadcast_to(_as_f(mu), shape)
    kappa = jnp.broadcast_to(_as_f(kappa), shape)
    tau = 1.0 + jnp.sqrt(1.0 + 4.0 * kappa * kappa)
    rho = (tau - jnp.sqrt(2.0 * tau)) / (2.0 * jnp.maximum(kappa, 1e-12))
    r = (1.0 + rho * rho) / (2.0 * rho)

    def cond(carry):
        _, _, _, done, it = carry
        return (~jnp.all(done)) & (it < 100)

    def body(carry):
        key, f_acc, sign, done, it = carry
        key, k1, k2, k3 = jax.random.split(key, 4)
        u1 = jax.random.uniform(k1, shape)
        u2 = jax.random.uniform(k2, shape)
        u3 = jax.random.uniform(k3, shape)
        z = jnp.cos(jnp.pi * u1)
        f = (1.0 + r * z) / (r + z)
        c = kappa * (r - f)
        accept = ((c * (2.0 - c) - u2) > 0.0) | (
            (jnp.log(jnp.maximum(c, 1e-300) / jnp.maximum(u2, 1e-300))
             + 1.0 - c) >= 0.0
        )
        take = accept & ~done
        f_acc = jnp.where(take, f, f_acc)
        sign = jnp.where(take, jnp.where(u3 < 0.5, -1.0, 1.0), sign)
        return key, f_acc, sign, done | accept, it + 1

    key0, f0 = key, jnp.ones(shape)
    _, f, sign, _, _ = jax.lax.while_loop(
        cond, body,
        (key0, f0, jnp.ones(shape), jnp.zeros(shape, bool),
         jnp.zeros((), jnp.int32)),
    )
    theta = sign * jnp.arccos(jnp.clip(f, -1.0, 1.0))
    return jnp.mod(mu + theta + jnp.pi, 2.0 * jnp.pi) - jnp.pi


# --------------------------------------------------------- HMM functions
# The reference gets these from Stan math's C++ hmm_marginal.hpp family
# via BridgeStan; here they are lax.scan forward(/backward) recursions in
# log space.  Convention (Stan docs): log_omega is K x N (states x
# observations), Gamma[i, j] = P(z_{n+1} = j | z_n = i), rho the initial
# state simplex.

def _hmm_forward(log_omega, Gamma, rho):
    lo = jnp.asarray(log_omega, jnp.result_type(float))
    lg = jnp.log(jnp.asarray(Gamma, jnp.result_type(float)))
    lrho = jnp.log(jnp.asarray(rho, jnp.result_type(float)))
    alpha0 = lrho + lo[:, 0]

    def step(alpha, lo_n):
        alpha_n = lo_n + jsp.logsumexp(alpha[:, None] + lg, axis=0)
        return alpha_n, alpha_n

    alpha_last, alphas_rest = jax.lax.scan(step, alpha0, lo[:, 1:].T)
    alphas = jnp.concatenate([alpha0[None, :], alphas_rest], axis=0)
    return alphas, alpha_last, lg, lo


def hmm_marginal(log_omega, Gamma, rho):
    _, alpha_last, _, _ = _hmm_forward(log_omega, Gamma, rho)
    return jsp.logsumexp(alpha_last)


def hmm_hidden_state_prob(log_omega, Gamma, rho):
    """K x N matrix of P(z_n = k | y_{1:N}) via forward-backward."""
    alphas, alpha_last, lg, lo = _hmm_forward(log_omega, Gamma, rho)
    n = lo.shape[1]
    beta_last = jnp.zeros(lo.shape[0])

    def bstep(beta, lo_next):
        beta_n = jsp.logsumexp(lg + (lo_next + beta)[None, :], axis=1)
        return beta_n, beta_n

    _, betas_rev = jax.lax.scan(bstep, beta_last, lo[:, 1:].T[::-1])
    betas = jnp.concatenate(
        [betas_rev[::-1], beta_last[None, :]], axis=0
    ) if n > 1 else beta_last[None, :]
    log_z = jsp.logsumexp(alpha_last)
    return jnp.exp(alphas + betas - log_z).T


def hmm_latent_rng(key, log_omega, Gamma, rho):
    """Sample a latent path via forward-filter backward-sample; returns
    1-based states (Stan convention)."""
    alphas, alpha_last, lg, lo = _hmm_forward(log_omega, Gamma, rho)
    n = lo.shape[1]
    key, k_last = jax.random.split(key)
    z_last = jax.random.categorical(k_last, alpha_last)

    def bstep(carry, inp):
        z_next, key = carry
        alpha_n = inp
        key, k = jax.random.split(key)
        logits = alpha_n + lg[:, z_next]
        z = jax.random.categorical(k, logits)
        return (z, key), z

    (_, _), zs_rev = jax.lax.scan(
        bstep, (z_last, key), alphas[:-1][::-1]
    )
    zs = jnp.concatenate([zs_rev[::-1], z_last[None]]) if n > 1 else (
        z_last[None]
    )
    return (zs + 1).astype(jnp.int32)


RNG_FUNCTIONS = {
    "normal_rng": lambda key, mu, sigma: mu + sigma * jax.random.normal(
        key, _bshape(mu, sigma)
    ),
    "std_normal_rng": lambda key: jax.random.normal(key, ()),
    "uniform_rng": lambda key, lo, hi: jax.random.uniform(
        key, _bshape(lo, hi), minval=lo, maxval=hi
    ),
    "lognormal_rng": lambda key, mu, sigma: jnp.exp(
        mu + sigma * jax.random.normal(key, _bshape(mu, sigma))
    ),
    "exponential_rng": lambda key, lam: jax.random.exponential(
        key, _bshape(lam)
    ) / lam,
    "gamma_rng": lambda key, a, b: jax.random.gamma(key, a, _bshape(a, b)) / b,
    "inv_gamma_rng": lambda key, a, b: b / jax.random.gamma(
        key, a, _bshape(a, b)
    ),
    "beta_rng": lambda key, a, b: jax.random.beta(key, a, b, _bshape(a, b)),
    "chi_square_rng": lambda key, nu: 2.0 * jax.random.gamma(
        key, jnp.asarray(nu) / 2.0, _bshape(nu)
    ),
    "student_t_rng": lambda key, nu, mu, sigma: mu + sigma * jax.random.t(
        key, nu, _bshape(nu, mu, sigma)
    ),
    "cauchy_rng": lambda key, mu, sigma: mu + sigma * jnp.tan(
        jnp.pi * (jax.random.uniform(key, _bshape(mu, sigma)) - 0.5)
    ),
    "double_exponential_rng": lambda key, mu, sigma: (
        lambda v: mu + sigma * jnp.sign(v) * -jnp.log1p(-2.0 * jnp.abs(v))
    )(jax.random.uniform(key, _bshape(mu, sigma)) - 0.5),
    "weibull_rng": lambda key, a, sigma: sigma * (
        -jnp.log1p(-jax.random.uniform(key, _bshape(a, sigma)))
    ) ** (1.0 / a),
    "bernoulli_rng": lambda key, p: jax.random.bernoulli(
        key, p, _bshape(p)
    ).astype(jnp.int32),
    "bernoulli_logit_rng": lambda key, a: jax.random.bernoulli(
        key, jax.nn.sigmoid(a), _bshape(a)
    ).astype(jnp.int32),
    "binomial_rng": lambda key, n, p: jax.random.binomial(
        key, n, p, _bshape(n, p)
    ).astype(jnp.int32),
    "poisson_rng": lambda key, lam: jax.random.poisson(
        key, lam, _bshape(lam)
    ).astype(jnp.int32),
    "poisson_log_rng": lambda key, a: jax.random.poisson(
        key, jnp.exp(a), _bshape(a)
    ).astype(jnp.int32),
    "categorical_rng": lambda key, theta: (
        jax.random.categorical(key, jnp.log(jnp.asarray(theta)), axis=-1) + 1
    ).astype(jnp.int32),
    "categorical_logit_rng": lambda key, beta: (
        jax.random.categorical(key, jnp.asarray(beta), axis=-1) + 1
    ).astype(jnp.int32),
    "dirichlet_rng": lambda key, alpha: jax.random.dirichlet(key, alpha),
    "multi_normal_rng": lambda key, mu, Sigma: jnp.asarray(mu)
    + jnp.linalg.cholesky(jnp.asarray(Sigma))
    @ jax.random.normal(key, (jnp.shape(mu)[-1],)),
    "beta_binomial_rng": lambda key, n, a, b: jax.random.binomial(
        jax.random.fold_in(key, 1), n,
        jax.random.beta(jax.random.fold_in(key, 0), a, b, _bshape(n, a, b)),
        _bshape(n, a, b),
    ).astype(jnp.int32),
    "ordered_logistic_rng": lambda key, eta, c: (
        jnp.sum(
            (jax.random.logistic(key, jnp.shape(eta)) + jnp.asarray(eta))[
                ..., None
            ]
            > jnp.atleast_1d(jnp.asarray(c)), axis=-1
        ) + 1
    ).astype(jnp.int32),
    "von_mises_rng": _von_mises_rng,
    "hmm_latent_rng": hmm_latent_rng,
    "skew_normal_rng": lambda key, xi, omega, alpha: (
        lambda k1, k2, d: xi + omega * (
            d * jnp.abs(jax.random.normal(k1, _bshape(xi, omega, alpha)))
            + jnp.sqrt(1 - d * d)
            * jax.random.normal(k2, _bshape(xi, omega, alpha))
        )
    )(
        jax.random.fold_in(key, 0), jax.random.fold_in(key, 1),
        jnp.asarray(alpha) / jnp.sqrt(1.0 + jnp.asarray(alpha) ** 2),
    ),
    "rayleigh_rng": lambda key, sigma: sigma * jnp.sqrt(
        -2.0 * jnp.log1p(-jax.random.uniform(key, _bshape(sigma)))
    ),
}


def is_multivariate(name: str) -> bool:
    return name in _MULTIVARIATE


# ------------------------------------------------------------ math functions

def _transpose(x):
    x = jnp.asarray(x)
    if x.ndim == 0:
        return x
    if x.ndim == 1:
        return x.reshape(1, -1)
    if x.ndim == 2 and x.shape[0] == 1:
        return x.ravel()
    return jnp.swapaxes(x, -1, -2)


def _dot(a, b):
    """Stan's ``*``: matrix product respecting vector/row_vector shapes."""
    a, b = jnp.asarray(a), jnp.asarray(b)
    if a.ndim == 0 or b.ndim == 0:
        return a * b
    if a.ndim == 1 and b.ndim == 1:
        # vector * vector is ill-typed in Stan; the common intent in the
        # models we accept is elementwise only via .*; treat as dot error
        raise StanCompileError(
            "vector * vector is not defined in Stan; use dot_product or .*"
        )
    if a.ndim == 1 and b.ndim == 2:
        # vector(n) * row_vector(1,m) -> outer (n,m); vector * matrix invalid
        if b.shape[0] == 1:
            return jnp.outer(a, b.ravel())
        raise StanCompileError("vector * matrix is not defined in Stan")
    if a.ndim == 2 and b.ndim == 1:
        # matrix(m,n) * vector(n) -> vector(m); row_vector(1,n) * vector -> real
        out = a @ b
        if a.shape[0] == 1:
            return out[0]
        return out
    return a @ b


def _divide(a, b):
    a, b = jnp.asarray(a), jnp.asarray(b)
    if b.ndim == 2 and a.ndim >= 1:
        # matrix division A / B = A B^-1
        return jnp.linalg.solve(_transpose(b), _transpose(a)).T
    return a / b


def _softmax(x):
    return jax.nn.softmax(jnp.asarray(x), axis=-1)


def _log_sum_exp(*args):
    if len(args) == 1:
        return jsp.logsumexp(jnp.asarray(args[0]))
    return jsp.logsumexp(jnp.stack([jnp.asarray(a) for a in args]))


def _rep_vector(x, n):
    return jnp.full((int(n),), x, jnp.result_type(float))


def _rep_row_vector(x, n):
    return jnp.full((1, int(n)), x, jnp.result_type(float))


def _rep_matrix(x, m, n=None):
    x = jnp.asarray(x)
    if n is None:
        # rep_matrix(vector, n) -> n copies of the vector as columns
        if x.ndim == 1:
            return jnp.tile(x[:, None], (1, int(m)))
        if x.ndim == 2 and x.shape[0] == 1:
            return jnp.tile(x, (int(m), 1))
        raise StanCompileError("rep_matrix: unsupported arguments")
    return jnp.full((int(m), int(n)), x, jnp.result_type(float))


def _rep_array(x, *dims):
    dims = tuple(int(d) for d in dims)
    x = jnp.asarray(x)
    return jnp.broadcast_to(x, dims + x.shape)


def _to_vector(x):
    x = jnp.asarray(x)
    if x.ndim == 2:
        # matrix -> column-major ravel (Stan is column-major)
        return x.T.ravel()
    return x.ravel()


def _to_matrix(x, m=None, n=None):
    x = jnp.asarray(x)
    if m is None:
        return jnp.atleast_2d(x)
    return x.ravel(order="F").reshape((int(m), int(n)), order="F") if hasattr(
        x, "ravel"
    ) else x


def _segment(x, start, n):
    return jax.lax.dynamic_slice_in_dim(
        jnp.asarray(x), jnp.asarray(start) - 1, int(n), axis=0
    )


def _head(x, n):
    return jnp.asarray(x)[: int(n)]


def _tail(x, n):
    x = jnp.asarray(x)
    return x[x.shape[0] - int(n):]


def _append_row(a, b):
    a, b = jnp.atleast_1d(jnp.asarray(a)), jnp.atleast_1d(jnp.asarray(b))
    if a.ndim == 1 and b.ndim == 1:
        return jnp.concatenate([a, b])
    return jnp.concatenate([jnp.atleast_2d(a), jnp.atleast_2d(b)], axis=0)


def _append_col(a, b):
    # Stan treats (column) vectors as n x 1 in append_col: two length-n
    # vectors give an (n, 2) matrix, and matrix+vector adds one column.
    a, b = jnp.asarray(a), jnp.asarray(b)
    if a.ndim == 1 and b.ndim == 1:
        return jnp.stack([a, b], axis=1)
    if a.ndim == 1:
        a = a[:, None]
    if b.ndim == 1:
        b = b[:, None]
    return jnp.concatenate([jnp.atleast_2d(a), jnp.atleast_2d(b)], axis=1)


def _quad_form(A, B):
    B = jnp.asarray(B)
    return _transpose(B) @ jnp.asarray(A) @ B


def _sd(x):
    x = jnp.asarray(x)
    return jnp.std(x, ddof=1)


def _variance(x):
    x = jnp.asarray(x)
    return jnp.var(x, ddof=1)


def _int_div(a, b):
    return a // b




FUNCTIONS = {
    # elementary
    "abs": jnp.abs, "fabs": jnp.abs, "fmin": jnp.minimum, "fmax": jnp.maximum,
    "min": lambda *a: jnp.minimum(*a) if len(a) == 2 else jnp.min(jnp.asarray(a[0])),
    "max": lambda *a: jnp.maximum(*a) if len(a) == 2 else jnp.max(jnp.asarray(a[0])),
    "sqrt": jnp.sqrt, "cbrt": jnp.cbrt, "square": jnp.square,
    "exp": jnp.exp, "exp2": jnp.exp2, "expm1": jnp.expm1,
    "log": jnp.log, "log2": jnp.log2, "log10": jnp.log10, "log1p": jnp.log1p,
    "log1m": lambda x: jnp.log1p(-jnp.asarray(x)),
    "log1p_exp": lambda x: jax.nn.softplus(jnp.asarray(x)),
    "log1m_exp": lambda x: jnp.log(-jnp.expm1(jnp.asarray(x))),
    "log_diff_exp": lambda a, b: jnp.asarray(a) + jnp.log1p(
        -jnp.exp(jnp.asarray(b) - jnp.asarray(a))
    ),
    "log_inv_logit": lambda x: -jax.nn.softplus(-jnp.asarray(x)),
    "log1m_inv_logit": lambda x: -jax.nn.softplus(jnp.asarray(x)),
    "inv": lambda x: 1.0 / jnp.asarray(x),
    "inv_sqrt": lambda x: 1.0 / jnp.sqrt(jnp.asarray(x)),
    "inv_square": lambda x: 1.0 / jnp.square(jnp.asarray(x)),
    "inv_logit": lambda x: jax.nn.sigmoid(jnp.asarray(x)),
    "logit": jsp.logit,
    "pow": jnp.power, "hypot": jnp.hypot,
    "floor": jnp.floor, "ceil": jnp.ceil, "round": jnp.round,
    "trunc": jnp.trunc, "fmod": jnp.fmod, "fdim": lambda a, b: jnp.maximum(
        jnp.asarray(a) - jnp.asarray(b), 0.0
    ),
    "step": lambda x: jnp.where(jnp.asarray(x) >= 0, 1.0, 0.0),
    "int_step": lambda x: jnp.where(jnp.asarray(x) > 0, 1, 0),
    "sin": jnp.sin, "cos": jnp.cos, "tan": jnp.tan,
    "asin": jnp.arcsin, "acos": jnp.arccos, "atan": jnp.arctan,
    "atan2": jnp.arctan2,
    "sinh": jnp.sinh, "cosh": jnp.cosh, "tanh": jnp.tanh,
    "asinh": jnp.arcsinh, "acosh": jnp.arccosh, "atanh": jnp.arctanh,
    "lgamma": jsp.gammaln, "tgamma": lambda x: jnp.exp(jsp.gammaln(jnp.asarray(x))),
    "digamma": jsp.digamma,
    "lmgamma": lambda k, x: jsp.multigammaln(jnp.asarray(x), int(k)),
    "lbeta": jsp.betaln,
    "binomial_coefficient_log": lambda n, k: (
        jsp.gammaln(jnp.asarray(n) + 1) - jsp.gammaln(jnp.asarray(k) + 1)
        - jsp.gammaln(jnp.asarray(n) - jnp.asarray(k) + 1)
    ),
    "lchoose": lambda n, k: (
        jsp.gammaln(jnp.asarray(n) + 1) - jsp.gammaln(jnp.asarray(k) + 1)
        - jsp.gammaln(jnp.asarray(n) - jnp.asarray(k) + 1)
    ),
    "lmultiply": lambda a, b: jnp.asarray(a) * jnp.log(jnp.asarray(b)),
    "multiply_log": lambda a, b: jnp.asarray(a) * jnp.log(jnp.asarray(b)),
    "erf": jsp.erf, "erfc": jsp.erfc, "Phi": jsp.ndtr,
    "Phi_approx": lambda x: jax.nn.sigmoid(
        0.07056 * jnp.asarray(x) ** 3 + 1.5976 * jnp.asarray(x)
    ),
    "inv_Phi": jsp.ndtri,
    # reductions / vector ops
    "sum": lambda x: jnp.sum(jnp.asarray(x)),
    "prod": lambda x: jnp.prod(jnp.asarray(x)),
    "mean": lambda x: jnp.mean(jnp.asarray(x)),
    "sd": _sd, "variance": _variance,
    "log_sum_exp": _log_sum_exp,
    "softmax": _softmax,
    "log_softmax": lambda x: jax.nn.log_softmax(jnp.asarray(x), axis=-1),
    "cumulative_sum": lambda x: jnp.cumsum(jnp.asarray(x), axis=-1),
    "dot_product": lambda a, b: jnp.sum(
        jnp.ravel(jnp.asarray(a)) * jnp.ravel(jnp.asarray(b))
    ),
    "dot_self": lambda x: jnp.sum(jnp.square(jnp.ravel(jnp.asarray(x)))),
    "columns_dot_product": lambda a, b: jnp.sum(
        jnp.asarray(a) * jnp.asarray(b), axis=0
    ).reshape(1, -1),
    "rows_dot_product": lambda a, b: jnp.sum(
        jnp.asarray(a) * jnp.asarray(b), axis=1
    ),
    "distance": lambda a, b: jnp.sqrt(
        jnp.sum(jnp.square(jnp.ravel(jnp.asarray(a)) - jnp.ravel(jnp.asarray(b))))
    ),
    "squared_distance": lambda a, b: jnp.sum(
        jnp.square(jnp.ravel(jnp.asarray(a)) - jnp.ravel(jnp.asarray(b)))
    ),
    "sort_asc": lambda x: jnp.sort(jnp.asarray(x)),
    "sort_desc": lambda x: -jnp.sort(-jnp.asarray(x)),
    "reverse": lambda x: jnp.flip(jnp.asarray(x), axis=0),
    # shapes / construction
    "rep_vector": _rep_vector,
    "rep_row_vector": _rep_row_vector,
    "rep_matrix": _rep_matrix,
    "rep_array": _rep_array,
    "to_vector": _to_vector,
    "to_row_vector": lambda x: _to_vector(x).reshape(1, -1),
    "to_array_1d": _to_vector,
    "to_matrix": _to_matrix,
    "linspaced_vector": lambda n, a, b: jnp.linspace(a, b, int(n)),
    # to_int truncates toward zero (Stan requires the value to fit; we
    # match numpy/XLA truncation semantics)
    "to_int": lambda x: (
        np.asarray(x).astype(np.int64)
        if isinstance(x, (int, float, np.generic, np.ndarray))
        else jnp.asarray(x).astype(jnp.int64)
    ),
    "ones_vector": lambda n: jnp.ones(int(n)),
    "zeros_vector": lambda n: jnp.zeros(int(n)),
    "ones_row_vector": lambda n: jnp.ones((1, int(n))),
    "zeros_row_vector": lambda n: jnp.zeros((1, int(n))),
    "identity_matrix": lambda n: jnp.eye(int(n)),
    "head": _head, "tail": _tail, "segment": _segment,
    "append_row": _append_row, "append_col": _append_col,
    # linear algebra
    "diag_matrix": lambda x: jnp.diag(jnp.ravel(jnp.asarray(x))),
    "diagonal": lambda x: jnp.diagonal(jnp.asarray(x)),
    "transpose": _transpose,
    "inverse": jnp.linalg.inv,
    "cholesky_decompose": jnp.linalg.cholesky,
    "determinant": jnp.linalg.det,
    "log_determinant": lambda x: jnp.linalg.slogdet(jnp.asarray(x))[1],
    "trace": jnp.trace,
    "quad_form": _quad_form,
    "quad_form_diag": lambda A, v: jnp.asarray(A)
    * (jnp.ravel(jnp.asarray(v))[:, None] * jnp.ravel(jnp.asarray(v))[None, :]),
    "diag_pre_multiply": lambda v, A: jnp.ravel(jnp.asarray(v))[:, None]
    * jnp.asarray(A),
    "diag_post_multiply": lambda A, v: jnp.asarray(A)
    * jnp.ravel(jnp.asarray(v))[None, :],
    "multiply_lower_tri_self_transpose": lambda L: jnp.asarray(L)
    @ _transpose(jnp.asarray(L)),
    "mdivide_left_tri_low": lambda L, b: jax.scipy.linalg.solve_triangular(
        jnp.asarray(L), jnp.asarray(b), lower=True
    ),
    "mdivide_right_tri_low": lambda b, L: jax.scipy.linalg.solve_triangular(
        jnp.asarray(L).T, jnp.asarray(b).T, lower=False
    ).T,
    "mdivide_left": lambda A, b: jnp.linalg.solve(jnp.asarray(A), jnp.asarray(b)),
    # hidden Markov models (forward/backward recursions)
    "hmm_marginal": hmm_marginal,
    "hmm_hidden_state_prob": hmm_hidden_state_prob,
    # mixtures
    "log_mix": lambda theta, a, b: jnp.logaddexp(
        jnp.log(jnp.asarray(theta)) + jnp.asarray(a),
        jnp.log1p(-jnp.asarray(theta)) + jnp.asarray(b),
    ),
    # special functions
    "inc_beta": lambda a, b, x: jsp.betainc(
        _as_f(a), _as_f(b), _as_f(x)
    ),
    "gamma_p": lambda a, z: jsp.gammainc(_as_f(a), _as_f(z)),
    "gamma_q": lambda a, z: jsp.gammaincc(_as_f(a), _as_f(z)),
    "trigamma": lambda x: jsp.polygamma(1, _as_f(x)),
    "choose": lambda n, k: jnp.round(jnp.exp(
        jsp.gammaln(_as_f(n) + 1) - jsp.gammaln(_as_f(k) + 1)
        - jsp.gammaln(_as_f(n) - _as_f(k) + 1)
    )).astype(jnp.int64),
    "falling_factorial": lambda x, n: jnp.exp(
        jsp.gammaln(_as_f(x) + 1) - jsp.gammaln(_as_f(x) - _as_f(n) + 1)
    ),
    "rising_factorial": lambda x, n: jnp.exp(
        jsp.gammaln(_as_f(x) + _as_f(n)) - jsp.gammaln(_as_f(x))
    ),
    "log_falling_factorial": lambda x, n: (
        jsp.gammaln(_as_f(x) + 1) - jsp.gammaln(_as_f(x) - _as_f(n) + 1)
    ),
    "log_rising_factorial": lambda x, n: (
        jsp.gammaln(_as_f(x) + _as_f(n)) - jsp.gammaln(_as_f(x))
    ),
    "inv_cloglog": lambda x: -jnp.expm1(-jnp.exp(_as_f(x))),
    "cloglog": lambda x: jnp.log(-jnp.log1p(-_as_f(x))),
    "fma": lambda x, y, z: _as_f(x) * _as_f(y) + _as_f(z),
    "ldexp": lambda x, n: _as_f(x) * jnp.exp2(_as_f(n)),
    "erf_inv": lambda x: jsp.erfinv(_as_f(x)),
    "inv_erfc": lambda x: jsp.erfinv(1.0 - _as_f(x)),
    # matrix decompositions (jnp.linalg rides the MXU)
    "matrix_exp": lambda A: jax.scipy.linalg.expm(_as_f(A)),
    "eigenvalues_sym": lambda A: jnp.linalg.eigvalsh(_as_f(A)),
    "eigenvectors_sym": lambda A: jnp.linalg.eigh(_as_f(A))[1],
    "qr_thin_Q": lambda A: jnp.linalg.qr(_as_f(A), mode="reduced")[0],
    "qr_thin_R": lambda A: jnp.linalg.qr(_as_f(A), mode="reduced")[1],
    "qr_Q": lambda A: jnp.linalg.qr(_as_f(A), mode="complete")[0],
    "qr_R": lambda A: jnp.linalg.qr(_as_f(A), mode="complete")[1],
    "singular_values": lambda A: jnp.linalg.svd(
        _as_f(A), compute_uv=False
    ),
    "svd_U": lambda A: jnp.linalg.svd(_as_f(A), full_matrices=False)[0],
    "svd_V": lambda A: jnp.swapaxes(
        jnp.linalg.svd(_as_f(A), full_matrices=False)[2], -1, -2
    ),
    "generalized_inverse": lambda A: jnp.linalg.pinv(_as_f(A)),
    "crossprod": lambda A: _transpose(_as_f(A)) @ _as_f(A),
    "tcrossprod": lambda A: _as_f(A) @ _transpose(_as_f(A)),
    # constants
    # (log2()/log10() as 0-arg constants are handled by arity dispatch in
    # the interpreter; the dict entries above are the 1-arg functions)
    "pi": lambda: jnp.pi,
    "e": lambda: jnp.e,
    "sqrt2": lambda: jnp.sqrt(2.0),
    "machine_precision": lambda: jnp.finfo(jnp.result_type(float)).eps,
    "positive_infinity": lambda: jnp.inf,
    "negative_infinity": lambda: -jnp.inf,
    "not_a_number": lambda: jnp.nan,
}


# ------------------------------------------------- round-5 breadth additions
# (reference: BridgeStan inherits all of Stan math's C++,
# /root/reference/src/stan.rs:449-463; each entry re-derived on jnp/jsp
# primitives and scipy cross-checked in tests/test_stanlib_breadth.py)

def inv_chi_square_lpdf(y, nu):
    y, nu = _as_f(y), _as_f(nu)
    h = nu / 2.0
    return -(h + 1.0) * jnp.log(y) - 0.5 / y - jsp.gammaln(h) - h * jnp.log(2.0)


def scaled_inv_chi_square_lpdf(y, nu, s):
    y, nu, s = _as_f(y), _as_f(nu), _as_f(s)
    h = nu / 2.0
    return (
        h * jnp.log(h) + nu * jnp.log(s) - jsp.gammaln(h)
        - (h + 1.0) * jnp.log(y) - h * s * s / y
    )


def pareto_type_2_lpdf(y, mu, lam, alpha):
    y, mu, lam, alpha = _as_f(y), _as_f(mu), _as_f(lam), _as_f(alpha)
    return (
        jnp.log(alpha) - jnp.log(lam)
        - (alpha + 1.0) * jnp.log1p((y - mu) / lam)
    )


def multi_normal_prec_lpdf(y, mu, Omega):
    y, mu, Omega = _as_f(y), _as_f(mu), _as_f(Omega)
    d = y.shape[-1]
    chol = jnp.linalg.cholesky(Omega)  # Omega = L L^T
    diff = y - mu
    z = jnp.einsum("...ij,...j->...i", jnp.swapaxes(chol, -1, -2), diff)
    return (
        -0.5 * jnp.sum(z * z, axis=-1)
        + jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
        - 0.5 * d * jnp.log(2 * jnp.pi)
    )


def multi_student_t_cholesky_lpdf(y, nu, mu, L):
    y, nu, mu, L = _as_f(y), _as_f(nu), _as_f(mu), _as_f(L)
    d = y.shape[-1]
    diff = y - mu
    z = jax.scipy.linalg.solve_triangular(L, diff, lower=True)
    q = jnp.sum(z * z, axis=-1)
    return (
        jsp.gammaln((nu + d) / 2.0) - jsp.gammaln(nu / 2.0)
        - 0.5 * d * jnp.log(nu * jnp.pi)
        - jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
        - 0.5 * (nu + d) * jnp.log1p(q / nu)
    )


def neg_binomial_lpmf(y, alpha, beta):
    # Stan's v1 parameterization: y ~ NB(alpha, beta), mean alpha/beta
    y, alpha, beta = _as_f(y), _as_f(alpha), _as_f(beta)
    return (
        jsp.gammaln(y + alpha) - jsp.gammaln(alpha) - jsp.gammaln(y + 1)
        + alpha * jnp.log(beta / (beta + 1.0)) - y * jnp.log1p(beta)
    )


def hypergeometric_lpmf(y, N, a, b):
    y, N, a, b = _as_f(y), _as_f(N), _as_f(a), _as_f(b)

    def lchoose(n, k):
        return (
            jsp.gammaln(n + 1) - jsp.gammaln(k + 1) - jsp.gammaln(n - k + 1)
        )

    return lchoose(a, y) + lchoose(b, N - y) - lchoose(a + b, N)


def discrete_range_lpmf(y, lower, upper):
    lower, upper = _as_f(lower), _as_f(upper)
    return -jnp.log(upper - lower + 1.0) + 0.0 * _as_f(y)


def wiener_lpdf(y, alpha, tau, beta, delta):
    """First-passage density of a Wiener diffusion at the LOWER boundary
    (Stan's wiener_lpdf): Navarro & Fuss (2009) with both the small-time
    and large-time series at fixed truncation, selected per element."""
    y, alpha = _as_f(y), _as_f(alpha)
    tau, beta, delta = _as_f(tau), _as_f(beta), _as_f(delta)
    t = (y - tau) / (alpha * alpha)  # normalized time
    t = jnp.maximum(t, 1e-9)
    w = beta

    ks = jnp.arange(-7, 8, dtype=t.dtype)
    terms_s = (w + 2.0 * ks) * jnp.exp(
        -0.5 * jnp.square(w + 2.0 * ks) / t[..., None]
    )
    f_small = jnp.sum(terms_s, axis=-1) / jnp.sqrt(
        2.0 * jnp.pi * t ** 3
    )

    kl = jnp.arange(1, 11, dtype=t.dtype)
    terms_l = kl * jnp.exp(-0.5 * jnp.square(kl * jnp.pi) * t[..., None]) \
        * jnp.sin(kl * jnp.pi * w)
    f_large = jnp.pi * jnp.sum(terms_l, axis=-1)

    f = jnp.where(t < 0.75, f_small, f_large)
    log_f = jnp.log(jnp.maximum(f, 1e-300))
    return (
        log_f - 2.0 * jnp.log(alpha)
        - delta * alpha * w - 0.5 * delta * delta * (y - tau)
    )


_MULTIVARIATE |= {"multi_normal_prec", "multi_student_t_cholesky"}

DISTRIBUTIONS.update({
    "inv_chi_square": inv_chi_square_lpdf,
    "scaled_inv_chi_square": scaled_inv_chi_square_lpdf,
    "pareto_type_2": pareto_type_2_lpdf,
    "multi_normal_prec": multi_normal_prec_lpdf,
    "multi_student_t_cholesky": multi_student_t_cholesky_lpdf,
    "neg_binomial": neg_binomial_lpmf,
    "hypergeometric": hypergeometric_lpmf,
    "discrete_range": discrete_range_lpmf,
    "wiener": wiener_lpdf,
})


# --- cdf breadth: every continuous/count family with a jsp special-function
# representation gets lcdf/lccdf (and therefore _cdf via the interpreter)

def beta_lcdf(y, alpha, beta):
    return jnp.log(jsp.betainc(alpha, beta, _as_f(y)))


def beta_lccdf(y, alpha, beta):
    return jnp.log1p(-jsp.betainc(alpha, beta, _as_f(y)))


def chi_square_lcdf(y, nu):
    return jnp.log(jsp.gammainc(nu / 2.0, 0.5 * _as_f(y)))


def chi_square_lccdf(y, nu):
    return jnp.log1p(-jsp.gammainc(nu / 2.0, 0.5 * _as_f(y)))


def inv_chi_square_lcdf(y, nu):
    return jnp.log1p(-jsp.gammainc(nu / 2.0, 0.5 / _as_f(y)))


def inv_chi_square_lccdf(y, nu):
    return jnp.log(jsp.gammainc(nu / 2.0, 0.5 / _as_f(y)))


def scaled_inv_chi_square_lcdf(y, nu, s):
    h = nu / 2.0
    return jnp.log1p(-jsp.gammainc(h, h * s * s / _as_f(y)))


def scaled_inv_chi_square_lccdf(y, nu, s):
    h = nu / 2.0
    return jnp.log(jsp.gammainc(h, h * s * s / _as_f(y)))


def inv_gamma_lcdf(y, alpha, beta):
    return jnp.log1p(-jsp.gammainc(alpha, beta / _as_f(y)))


def inv_gamma_lccdf(y, alpha, beta):
    return jnp.log(jsp.gammainc(alpha, beta / _as_f(y)))


def double_exponential_lcdf(y, mu, sigma):
    z = (_as_f(y) - mu) / sigma
    return jnp.where(
        z < 0, jnp.log(0.5) + z, jnp.log1p(-0.5 * jnp.exp(-z))
    )


def double_exponential_lccdf(y, mu, sigma):
    z = (_as_f(y) - mu) / sigma
    return jnp.where(
        z < 0, jnp.log1p(-0.5 * jnp.exp(z)), jnp.log(0.5) - z
    )


def pareto_lcdf(y, y_min, alpha):
    return jnp.log1p(-((y_min / _as_f(y)) ** alpha))


def pareto_lccdf(y, y_min, alpha):
    return alpha * (jnp.log(y_min) - jnp.log(_as_f(y)))


def pareto_type_2_lcdf(y, mu, lam, alpha):
    return jnp.log1p(-((1.0 + (_as_f(y) - mu) / lam) ** (-alpha)))


def pareto_type_2_lccdf(y, mu, lam, alpha):
    return -alpha * jnp.log1p((_as_f(y) - mu) / lam)


def frechet_lcdf(y, alpha, sigma):
    return -((sigma / _as_f(y)) ** alpha)


def frechet_lccdf(y, alpha, sigma):
    return jnp.log1p(-jnp.exp(-((sigma / _as_f(y)) ** alpha)))


def rayleigh_lcdf(y, sigma):
    z = _as_f(y) / sigma
    return jnp.log1p(-jnp.exp(-0.5 * z * z))


def rayleigh_lccdf(y, sigma):
    z = _as_f(y) / sigma
    return -0.5 * z * z


def std_normal_lcdf(y):
    return jsp.log_ndtr(_as_f(y))


def std_normal_lccdf(y):
    return jsp.log_ndtr(-_as_f(y))


def exp_mod_normal_lcdf(y, mu, sigma, lam):
    y = _as_f(y)
    u = lam * (y - mu)
    v = lam * sigma
    cdf = jsp.ndtr((y - mu) / sigma) - jnp.exp(
        -u + 0.5 * v * v + jsp.log_ndtr(u / v - v)
    )
    return jnp.log(jnp.maximum(cdf, 1e-300))


def exp_mod_normal_lccdf(y, mu, sigma, lam):
    y = _as_f(y)
    u = lam * (y - mu)
    v = lam * sigma
    cdf = jsp.ndtr((y - mu) / sigma) - jnp.exp(
        -u + 0.5 * v * v + jsp.log_ndtr(u / v - v)
    )
    return jnp.log1p(-jnp.minimum(cdf, 1.0 - 1e-16))


def poisson_lcdf(y, lam):
    # P(Y <= y) = Q(floor(y)+1, lam) (regularized upper incomplete gamma)
    return jnp.log(jsp.gammaincc(jnp.floor(_as_f(y)) + 1.0, _as_f(lam)))


def poisson_lccdf(y, lam):
    return jnp.log(jsp.gammainc(jnp.floor(_as_f(y)) + 1.0, _as_f(lam)))


def binomial_lcdf(y, n, theta):
    # P(Y <= y) = I_{1-theta}(n - y, y + 1)
    y, n = jnp.floor(_as_f(y)), _as_f(n)
    return jnp.log(jsp.betainc(n - y, y + 1.0, 1.0 - _as_f(theta)))


def binomial_lccdf(y, n, theta):
    y, n = jnp.floor(_as_f(y)), _as_f(n)
    return jnp.log1p(-jsp.betainc(n - y, y + 1.0, 1.0 - _as_f(theta)))


def neg_binomial_2_lcdf(y, mu, phi):
    # NB2 cdf = I_{phi/(phi+mu)}(phi, y+1)
    y = jnp.floor(_as_f(y))
    p = phi / (phi + _as_f(mu))
    return jnp.log(jsp.betainc(_as_f(phi), y + 1.0, p))


def neg_binomial_2_lccdf(y, mu, phi):
    y = jnp.floor(_as_f(y))
    p = phi / (phi + _as_f(mu))
    return jnp.log1p(-jsp.betainc(_as_f(phi), y + 1.0, p))


def bernoulli_lcdf(y, theta):
    y = jnp.floor(_as_f(y))
    cdf = jnp.where(y < 0, 0.0, jnp.where(y < 1, 1.0 - _as_f(theta), 1.0))
    return jnp.log(jnp.maximum(cdf, 1e-300))


def bernoulli_lccdf(y, theta):
    y = jnp.floor(_as_f(y))
    ccdf = jnp.where(y < 0, 1.0, jnp.where(y < 1, _as_f(theta), 0.0))
    return jnp.log(jnp.maximum(ccdf, 1e-300))


LCDFS.update({
    "beta": beta_lcdf,
    "chi_square": chi_square_lcdf,
    "inv_chi_square": inv_chi_square_lcdf,
    "scaled_inv_chi_square": scaled_inv_chi_square_lcdf,
    "inv_gamma": inv_gamma_lcdf,
    "double_exponential": double_exponential_lcdf,
    "pareto": pareto_lcdf,
    "pareto_type_2": pareto_type_2_lcdf,
    "frechet": frechet_lcdf,
    "rayleigh": rayleigh_lcdf,
    "std_normal": std_normal_lcdf,
    "exp_mod_normal": exp_mod_normal_lcdf,
    "poisson": poisson_lcdf,
    "binomial": binomial_lcdf,
    "neg_binomial_2": neg_binomial_2_lcdf,
    "bernoulli": bernoulli_lcdf,
})
LCCDFS.update({
    "beta": beta_lccdf,
    "chi_square": chi_square_lccdf,
    "inv_chi_square": inv_chi_square_lccdf,
    "scaled_inv_chi_square": scaled_inv_chi_square_lccdf,
    "inv_gamma": inv_gamma_lccdf,
    "double_exponential": double_exponential_lccdf,
    "pareto": pareto_lccdf,
    "pareto_type_2": pareto_type_2_lccdf,
    "frechet": frechet_lccdf,
    "rayleigh": rayleigh_lccdf,
    "std_normal": std_normal_lccdf,
    "exp_mod_normal": exp_mod_normal_lccdf,
    "poisson": poisson_lccdf,
    "binomial": binomial_lccdf,
    "neg_binomial_2": neg_binomial_2_lccdf,
    "bernoulli": bernoulli_lccdf,
})


# --- function breadth

_OWENS_T_NODES, _OWENS_T_WEIGHTS = np.polynomial.legendre.leggauss(48)


def owens_t(h, a):
    """Owen's T function by 48-point Gauss-Legendre on the defining
    integral T(h,a) = (1/2pi) int_0^a exp(-h^2(1+x^2)/2)/(1+x^2) dx
    (differentiable in both arguments; |error| < 1e-14 for |a| <= 1,
    reduced via T(h,a) = T(h,1)... no reduction needed at this order)."""
    h, a = _as_f(h), _as_f(a)
    half_a = 0.5 * a
    acc = 0.0
    for xj, wj in zip(_OWENS_T_NODES, _OWENS_T_WEIGHTS):
        x = half_a * (xj + 1.0)
        acc = acc + wj * jnp.exp(-0.5 * h * h * (1.0 + x * x)) / (
            1.0 + x * x
        )
    return half_a * acc / (2.0 * jnp.pi)


def skew_normal_lcdf(y, xi, omega, alpha):
    z = (_as_f(y) - xi) / omega
    cdf = jsp.ndtr(z) - 2.0 * owens_t(z, alpha)
    return jnp.log(jnp.maximum(cdf, 1e-300))


def skew_normal_lccdf(y, xi, omega, alpha):
    z = (_as_f(y) - xi) / omega
    cdf = jsp.ndtr(z) - 2.0 * owens_t(z, alpha)
    return jnp.log1p(-jnp.minimum(cdf, 1.0 - 1e-16))


LCDFS["skew_normal"] = skew_normal_lcdf
LCCDFS["skew_normal"] = skew_normal_lccdf


FUNCTIONS.update({
    "owens_t": owens_t,
    "trace_quad_form": lambda A, B: jnp.trace(
        _transpose(_as_f(B)) @ _as_f(A) @ _as_f(B)
    ),
    "rank": lambda v, s: jnp.sum(
        (_as_f(v) < _as_f(v)[..., jnp.asarray(s) - 1]).astype(jnp.int64),
        axis=-1,
    ),
    "sort_indices_asc": lambda v: jnp.argsort(_as_f(v), axis=-1) + 1,
    "sort_indices_desc": lambda v: jnp.argsort(-_as_f(v), axis=-1) + 1,
    "uniform_simplex": lambda n: jnp.full((int(n),), 1.0 / float(n)),
    "to_array_2d": lambda m: jnp.asarray(m),
    "std_normal_log_qf": lambda lp: jsp.ndtri(jnp.exp(_as_f(lp))),
})


RNG_FUNCTIONS.update({
    "inv_chi_square_rng": lambda key, nu: 1.0 / (
        2.0 * jax.random.gamma(key, _as_f(nu) / 2.0, _bshape(nu))
    ),
    "scaled_inv_chi_square_rng": lambda key, nu, s: (
        _as_f(nu) * _as_f(s) ** 2
        / (2.0 * jax.random.gamma(key, _as_f(nu) / 2.0, _bshape(nu, s)))
    ),
    "pareto_type_2_rng": lambda key, mu, lam, alpha: _as_f(mu) + _as_f(lam) * (
        (1.0 - jax.random.uniform(key, _bshape(mu, lam, alpha)))
        ** (-1.0 / _as_f(alpha)) - 1.0
    ),
    "pareto_rng": lambda key, y_min, alpha: _as_f(y_min) * (
        (1.0 - jax.random.uniform(key, _bshape(y_min, alpha)))
        ** (-1.0 / _as_f(alpha))
    ),
    "neg_binomial_rng": lambda key, alpha, beta: jax.random.poisson(
        jax.random.split(key)[0],
        jax.random.gamma(jax.random.split(key)[1], _as_f(alpha),
                         _bshape(alpha, beta)) / _as_f(beta),
    ),
    "neg_binomial_2_rng": lambda key, mu, phi: jax.random.poisson(
        jax.random.split(key)[0],
        jax.random.gamma(jax.random.split(key)[1], _as_f(phi),
                         _bshape(mu, phi)) * _as_f(mu) / _as_f(phi),
    ),
    "discrete_range_rng": lambda key, lo, hi: jax.random.randint(
        key, _bshape(lo, hi), jnp.asarray(lo), jnp.asarray(hi) + 1
    ),
    "frechet_rng": lambda key, alpha, sigma: _as_f(sigma) * (
        -jnp.log(jax.random.uniform(key, _bshape(alpha, sigma)))
    ) ** (-1.0 / _as_f(alpha)),
    "gumbel_rng": lambda key, mu, beta: _as_f(mu) - _as_f(beta) * jnp.log(
        -jnp.log(jax.random.uniform(key, _bshape(mu, beta)))
    ),
    "logistic_rng": lambda key, mu, sigma: _as_f(mu) + _as_f(sigma) * (
        jax.random.logistic(key, _bshape(mu, sigma))
    ),
})


def skew_double_exponential_lcdf(y, mu, sigma, tau):
    # cdf: tau * exp((1-tau) z / sigma ... Stan: for y < mu:
    #   tau * exp((1-tau)(y-mu)/sigma); else 1 - (1-tau) exp(-tau (y-mu)/sigma)
    z = _as_f(y) - _as_f(mu)
    t, s = _as_f(tau), _as_f(sigma)
    lo = jnp.log(t) + (1.0 - t) * z * 2.0 / s
    hi = jnp.log1p(-(1.0 - t) * jnp.exp(-t * z * 2.0 / s))
    return jnp.where(z < 0, lo, hi)


def skew_double_exponential_lccdf(y, mu, sigma, tau):
    z = _as_f(y) - _as_f(mu)
    t, s = _as_f(tau), _as_f(sigma)
    lo = jnp.log1p(-t * jnp.exp((1.0 - t) * z * 2.0 / s))
    hi = jnp.log1p(-t) - t * z * 2.0 / s
    return jnp.where(z < 0, lo, hi)


def beta_proportion_lcdf(y, mu, kappa):
    m, k = _as_f(mu), _as_f(kappa)
    return jnp.log(jsp.betainc(m * k, (1.0 - m) * k, _as_f(y)))


def beta_proportion_lccdf(y, mu, kappa):
    m, k = _as_f(mu), _as_f(kappa)
    return jnp.log1p(-jsp.betainc(m * k, (1.0 - m) * k, _as_f(y)))


def neg_binomial_lcdf(y, alpha, beta):
    yv = jnp.floor(_as_f(y))
    p = _as_f(beta) / (_as_f(beta) + 1.0)
    return jnp.log(jsp.betainc(_as_f(alpha), yv + 1.0, p))


def neg_binomial_lccdf(y, alpha, beta):
    yv = jnp.floor(_as_f(y))
    p = _as_f(beta) / (_as_f(beta) + 1.0)
    return jnp.log1p(-jsp.betainc(_as_f(alpha), yv + 1.0, p))


LCDFS.update({
    "skew_double_exponential": skew_double_exponential_lcdf,
    "beta_proportion": beta_proportion_lcdf,
    "neg_binomial": neg_binomial_lcdf,
})
LCCDFS.update({
    "skew_double_exponential": skew_double_exponential_lccdf,
    "beta_proportion": beta_proportion_lccdf,
    "neg_binomial": neg_binomial_lccdf,
})


def beta_binomial_lcdf(y, n, alpha, beta):
    # y and n are Stan ints (data) -> concrete at trace time; the cdf is
    # the exact logsumexp over k = 0..floor(y)
    y_c = int(np.floor(float(np.asarray(y))))
    ks = jnp.arange(0, max(y_c, 0) + 1)
    lps = beta_binomial_lpmf(ks, n, alpha, beta)
    out = jsp.logsumexp(lps)
    return jnp.where(jnp.asarray(y_c) < 0, -jnp.inf, out)


def beta_binomial_lccdf(y, n, alpha, beta):
    y_c = int(np.floor(float(np.asarray(y))))
    n_c = int(np.asarray(n))
    ks = jnp.arange(min(y_c + 1, n_c + 1), n_c + 1)
    if ks.shape[0] == 0:
        return jnp.asarray(-jnp.inf)
    lps = beta_binomial_lpmf(ks, n, alpha, beta)
    return jsp.logsumexp(lps)


LCDFS["beta_binomial"] = beta_binomial_lcdf
LCCDFS["beta_binomial"] = beta_binomial_lccdf
