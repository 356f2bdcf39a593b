"""Round-5 stanlib breadth: scipy/numpy cross-checks for the added
distributions, cdfs, rngs, functions, and complex helpers.

Reference parity note: BridgeStan inherits all of Stan math's C++
(/root/reference/src/stan.rs:449-463); these are the re-derived JAX
equivalents.
"""

import numpy as np
import pytest
import scipy.special as sp
import scipy.stats as st

import jax
import jax.numpy as jnp

import nutpie_tpu
from nutpie_tpu.frontends.stan import stanlib

pytestmark = pytest.mark.stan


def test_new_lpdfs_against_scipy():
    # inv_chi_square(nu) == invgamma(nu/2, scale=1/2)
    v = float(stanlib.inv_chi_square_lpdf(0.7, 3.0))
    assert abs(v - st.invgamma.logpdf(0.7, 1.5, scale=0.5)) < 2e-5
    # scaled_inv_chi_square(nu, s) == invgamma(nu/2, scale=nu s^2/2)
    v = float(stanlib.scaled_inv_chi_square_lpdf(0.9, 4.0, 1.3))
    assert abs(v - st.invgamma.logpdf(0.9, 2.0, scale=2 * 1.3**2)) < 2e-5
    # pareto_type_2(mu, lambda, alpha) == lomax shifted
    v = float(stanlib.pareto_type_2_lpdf(2.5, 1.0, 2.0, 3.0))
    assert abs(v - st.lomax.logpdf(2.5 - 1.0, 3.0, scale=2.0)) < 2e-5
    # multi_normal_prec == multivariate_normal with cov = inv(Omega)
    Om = np.array([[2.0, 0.4], [0.4, 1.5]])
    y = np.array([0.3, -0.8])
    mu = np.array([0.1, 0.2])
    v = float(stanlib.multi_normal_prec_lpdf(y, mu, Om))
    ref = st.multivariate_normal.logpdf(y, mu, np.linalg.inv(Om))
    assert abs(v - ref) < 2e-5
    # multi_student_t_cholesky == multi_student_t with Sigma = L L^T
    S = np.array([[2.0, 0.3], [0.3, 1.0]])
    L = np.linalg.cholesky(S)
    v = float(stanlib.multi_student_t_cholesky_lpdf(y, 4.0, mu, L))
    ref = float(stanlib.multi_student_t_lpdf(y, 4.0, mu, S))
    assert abs(v - ref) < 2e-5
    # neg_binomial(alpha, beta) == nbinom(n=alpha, p=beta/(beta+1))
    v = float(stanlib.neg_binomial_lpmf(4, 2.5, 1.5))
    assert abs(v - st.nbinom.logpmf(4, 2.5, 1.5 / 2.5)) < 2e-5
    # hypergeometric(N, a, b): scipy hypergeom(M=a+b, n=a, N=N)
    v = float(stanlib.hypergeometric_lpmf(3, 5, 6, 8))
    assert abs(v - st.hypergeom.logpmf(3, 14, 6, 5)) < 2e-5
    # discrete_range
    v = float(stanlib.discrete_range_lpmf(4, 2, 7))
    assert abs(v - np.log(1 / 6)) < 1e-12


def test_wiener_lpdf_properties():
    """No scipy reference exists; check (1) the density integrates to the
    analytic lower-boundary absorption probability, and (2) small/large
    time branches agree at the switch point."""
    alpha, tau, beta, delta = 1.3, 0.25, 0.45, 0.6
    # P(absorb at lower) for BM with drift v on [0, a], start z = beta*a:
    # (exp(-2 v z) - exp(-2 v a)) / (1 - exp(-2 v a))
    z0, va = beta * alpha, delta * alpha
    p_lower = (np.exp(-2 * delta * z0) - np.exp(-2 * va)) / (
        1 - np.exp(-2 * va)
    )
    ts = np.linspace(tau + 1e-4, tau + 40.0, 300_000)
    dens = np.exp(np.asarray(stanlib.wiener_lpdf(
        ts, alpha, tau, beta, delta)))
    integral = np.trapezoid(dens, ts)
    assert abs(integral - p_lower) < 5e-3, (integral, p_lower)
    # branch continuity at t' = 0.75 (y = tau + 0.75 alpha^2)
    y_sw = tau + 0.75 * alpha**2
    lo = float(stanlib.wiener_lpdf(y_sw - 1e-4, alpha, tau, beta, delta))
    hi = float(stanlib.wiener_lpdf(y_sw + 1e-4, alpha, tau, beta, delta))
    assert abs(lo - hi) < 1e-3


def test_new_lcdfs_against_scipy():
    cases = [
        (stanlib.beta_lcdf(0.3, 2.0, 5.0), st.beta.logcdf(0.3, 2, 5)),
        (stanlib.chi_square_lcdf(2.5, 3.0), st.chi2.logcdf(2.5, 3)),
        (stanlib.inv_chi_square_lcdf(0.7, 3.0),
         st.invgamma.logcdf(0.7, 1.5, scale=0.5)),
        (stanlib.scaled_inv_chi_square_lcdf(0.9, 4.0, 1.3),
         st.invgamma.logcdf(0.9, 2.0, scale=2 * 1.3**2)),
        (stanlib.inv_gamma_lcdf(0.8, 2.0, 1.5),
         st.invgamma.logcdf(0.8, 2.0, scale=1.5)),
        (stanlib.double_exponential_lcdf(-0.4, 0.1, 1.2),
         st.laplace.logcdf(-0.4, 0.1, 1.2)),
        (stanlib.double_exponential_lcdf(0.9, 0.1, 1.2),
         st.laplace.logcdf(0.9, 0.1, 1.2)),
        (stanlib.pareto_lcdf(2.2, 1.0, 3.0),
         st.pareto.logcdf(2.2, 3.0)),
        (stanlib.pareto_type_2_lcdf(2.5, 1.0, 2.0, 3.0),
         st.lomax.logcdf(1.5, 3.0, scale=2.0)),
        (stanlib.frechet_lcdf(1.7, 2.0, 1.1),
         st.invweibull.logcdf(1.7, 2.0, scale=1.1)),
        (stanlib.rayleigh_lcdf(1.4, 0.9),
         st.rayleigh.logcdf(1.4, scale=0.9)),
        (stanlib.std_normal_lcdf(0.6), st.norm.logcdf(0.6)),
        (stanlib.exp_mod_normal_lcdf(1.1, 0.2, 0.8, 1.5),
         st.exponnorm.logcdf(1.1, 1 / (0.8 * 1.5), loc=0.2, scale=0.8)),
        (stanlib.poisson_lcdf(3, 2.5), st.poisson.logcdf(3, 2.5)),
        (stanlib.binomial_lcdf(4, 10, 0.3), st.binom.logcdf(4, 10, 0.3)),
        (stanlib.neg_binomial_2_lcdf(5, 4.0, 3.0),
         st.nbinom.logcdf(5, 3.0, 3.0 / 7.0)),
        (stanlib.bernoulli_lcdf(0, 0.3), np.log(0.7)),
        (stanlib.skew_normal_lcdf(0.7, 0.1, 1.5, 2.0),
         st.skewnorm.logcdf(0.7, 2.0, loc=0.1, scale=1.5)),
    ]
    for got, want in cases:
        assert abs(float(got) - float(want)) < 5e-5, (float(got), float(want))
    # lccdf = log(1 - cdf) for a few
    ccdf_cases = [
        (stanlib.beta_lccdf(0.3, 2.0, 5.0), st.beta.logsf(0.3, 2, 5)),
        (stanlib.poisson_lccdf(3, 2.5), st.poisson.logsf(3, 2.5)),
        (stanlib.rayleigh_lccdf(1.4, 0.9), st.rayleigh.logsf(1.4, scale=0.9)),
        (stanlib.skew_normal_lccdf(0.7, 0.1, 1.5, 2.0),
         st.skewnorm.logsf(0.7, 2.0, loc=0.1, scale=1.5)),
    ]
    for got, want in ccdf_cases:
        assert abs(float(got) - float(want)) < 5e-5


def test_owens_t_and_functions():
    for h, a in [(0.3, 0.5), (1.2, 2.0), (-0.7, 0.9), (2.0, -1.5)]:
        assert abs(float(stanlib.owens_t(h, a)) - sp.owens_t(h, a)) < 1e-10
    F = stanlib.FUNCTIONS
    A = np.array([[2.0, 0.3], [0.3, 1.0]])
    B = np.array([[1.0, 2.0], [0.5, -1.0]])
    assert abs(float(F["trace_quad_form"](A, B))
               - np.trace(B.T @ A @ B)) < 1e-10
    v = np.array([3.0, 1.0, 2.0, 5.0])
    assert int(F["rank"](v, 3)) == 1       # components less than v[3]=2.0
    np.testing.assert_array_equal(
        np.asarray(F["sort_indices_asc"](v)), [2, 3, 1, 4])
    np.testing.assert_array_equal(
        np.asarray(F["sort_indices_desc"](v)), [4, 1, 3, 2])
    np.testing.assert_allclose(
        np.asarray(F["uniform_simplex"](4)), np.full(4, 0.25))
    lp = np.log(0.8413447460685429)
    assert abs(float(F["std_normal_log_qf"](lp)) - 1.0) < 1e-9
    m = np.array([[1.0, 2.0], [3.0, 4.0]])
    np.testing.assert_array_equal(np.asarray(F["to_array_2d"](m)), m)


def test_new_rngs_statistics():
    key = jax.random.PRNGKey(0)
    R = stanlib.RNG_FUNCTIONS
    ks = jax.random.split(key, 4000)
    draw = lambda name, *a: np.asarray(
        jax.vmap(lambda k: R[name](k, *a))(ks))
    x = draw("neg_binomial_rng", 3.0, 1.5)
    assert abs(x.mean() - 2.0) < 0.15            # mean alpha/beta
    x = draw("scaled_inv_chi_square_rng", 6.0, 1.0)
    assert abs(x.mean() - 6.0 / 4.0) < 0.12      # mean nu s^2/(nu-2)
    x = draw("pareto_type_2_rng", 0.0, 2.0, 3.0)
    assert abs(np.median(x) - 2.0 * (2 ** (1 / 3) - 1)) < 0.06
    x = draw("discrete_range_rng", 2, 7)
    assert x.min() >= 2 and x.max() <= 7
    assert abs(x.mean() - 4.5) < 0.12
    x = draw("gumbel_rng", 0.5, 1.2)
    assert abs(x.mean() - (0.5 + 1.2 * np.euler_gamma)) < 0.1
    x = draw("logistic_rng", 0.3, 0.8)
    assert abs(x.mean() - 0.3) < 0.1
    x = draw("frechet_rng", 3.0, 1.0)
    assert abs(np.median(x) - (np.log(2.0)) ** (-1 / 3)) < 0.06


def test_complex_helpers_in_program():
    code = """
    data { real re; real im; }
    parameters { real x; }
    model { x ~ normal(0, 1); }
    generated quantities {
      complex z = to_complex(re, im);
      real n = norm(z);
      real a = arg(z);
      complex p = polar(2.0, 0.5);
      real p_re = get_real(p);
      real p_im = get_imag(p);
      complex pr = proj(z);
      real pr_re = get_real(pr);
    }
    """
    m = nutpie_tpu.compile_stan_model(code=code).with_data(re=3.0, im=4.0)
    tr = nutpie_tpu.sample(m, chains=1, tune=10, draws=10, seed=0,
                           progress_bar=False)
    gq = tr.posterior
    assert abs(float(np.asarray(gq["n"].values)[0, 0]) - 25.0) < 1e-6
    assert abs(float(np.asarray(gq["a"].values)[0, 0])
               - np.arctan2(4.0, 3.0)) < 1e-6
    assert abs(float(np.asarray(gq["p_re"].values)[0, 0])
               - 2 * np.cos(0.5)) < 1e-6
    assert abs(float(np.asarray(gq["p_im"].values)[0, 0])
               - 2 * np.sin(0.5)) < 1e-6
    assert abs(float(np.asarray(gq["pr_re"].values)[0, 0]) - 3.0) < 1e-6


def test_new_distributions_sampling_e2e():
    """The new families work as sampling statements with parameters."""
    code = """
    data { int N; array[N] real y; }
    parameters { real<lower=0> s; }
    model {
      s ~ scaled_inv_chi_square(4, 1);
      y ~ normal(0, sqrt(s));
    }
    """
    rng = np.random.default_rng(0)
    yv = rng.normal(0, 1.3, 200)
    m = nutpie_tpu.compile_stan_model(code=code).with_data(N=200, y=yv)
    tr = nutpie_tpu.sample(m, chains=2, tune=300, draws=300, seed=1,
                           progress_bar=False)
    s = np.asarray(tr.posterior["s"].values)
    assert abs(s.mean() - yv.var()) < 0.4


def test_more_lcdf_families():
    """skew_double_exponential / beta_proportion / neg_binomial v1 cdfs:
    d/dy exp(lcdf) == exp(lpdf), scipy where a reference exists."""
    def deriv_matches(lcdf, lpdf, ys, *params):
        for y in ys:
            h = 1e-6
            d = (np.exp(float(lcdf(y + h, *params)))
                 - np.exp(float(lcdf(y - h, *params)))) / (2 * h)
            p = np.exp(float(lpdf(y, *params)))
            assert abs(d - p) < 1e-5 * max(1.0, p), (y, d, p)

    deriv_matches(stanlib.skew_double_exponential_lcdf,
                  stanlib.skew_double_exponential_lpdf,
                  [-1.5, -0.2, 0.4, 2.0], 0.1, 1.3, 0.4)
    deriv_matches(stanlib.beta_proportion_lcdf,
                  stanlib.beta_proportion_lpdf,
                  [0.2, 0.5, 0.8], 0.4, 5.0)
    v = float(stanlib.neg_binomial_lcdf(4, 2.5, 1.5))
    assert abs(v - st.nbinom.logcdf(4, 2.5, 1.5 / 2.5)) < 1e-6
    v = float(stanlib.neg_binomial_lccdf(4, 2.5, 1.5))
    assert abs(v - st.nbinom.logsf(4, 2.5, 1.5 / 2.5)) < 1e-6
    for y in (-1.0, 0.6):
        a = np.exp(float(stanlib.skew_double_exponential_lcdf(
            y, 0.1, 1.3, 0.4)))
        b = np.exp(float(stanlib.skew_double_exponential_lccdf(
            y, 0.1, 1.3, 0.4)))
        assert abs(a + b - 1) < 1e-9


def test_beta_binomial_cdf():
    v = float(stanlib.beta_binomial_lcdf(3, 10, 2.0, 5.0))
    assert abs(v - st.betabinom.logcdf(3, 10, 2.0, 5.0)) < 1e-6
    v = float(stanlib.beta_binomial_lccdf(3, 10, 2.0, 5.0))
    assert abs(v - st.betabinom.logsf(3, 10, 2.0, 5.0)) < 1e-6
    assert float(stanlib.beta_binomial_lccdf(10, 10, 2.0, 5.0)) == -np.inf
