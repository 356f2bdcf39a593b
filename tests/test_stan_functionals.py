"""Stan higher-order functionals, implemented natively in JAX.

The reference gets every one of these from Stan math's C++ via BridgeStan
(`/root/reference/src/stan.rs:449-463`); here they are rebuilt on JAX
primitives (`nutpie_tpu/frontends/stan/functionals.py`, HMM recursions in
`stanlib.py`).  Each test checks VALUES against an analytic or brute-force
answer and, where the functional feeds the likelihood, exercises the
gradient path end-to-end through NUTS.
"""

import itertools

import numpy as np
import pytest

import nutpie_tpu

pytestmark = pytest.mark.stan


def test_reduce_sum_exact_identity():
    # reduce_sum's contract (any partition sums to the same value) makes
    # one full-slice call the exact TPU lowering; posterior must match
    # the vectorized spelling of the same model
    code = """
    functions {
      real partial_sum(array[] real y_slice, int start, int end, real mu) {
        real s = 0;
        for (i in 1:(end - start + 1)) s += normal_lpdf(y_slice[i] | mu, 1);
        return s;
      }
    }
    data { int N; array[N] real y; }
    parameters { real mu; }
    model { target += reduce_sum(partial_sum, y, 8, mu); mu ~ normal(0, 10); }
    """
    rng = np.random.default_rng(0)
    y = rng.normal(2.0, 1.0, size=20)
    m = nutpie_tpu.compile_stan_model(code=code).with_data(N=20, y=y)
    tr = nutpie_tpu.sample(m, chains=2, tune=200, draws=300, seed=0,
                           progress_bar=False)
    mu = np.asarray(tr.posterior["mu"].values)
    # conjugate posterior: N(sum(y)/(N + 1/100), ...) ~= ybar
    assert abs(mu.mean() - y.mean()) < 0.3


def test_map_rect_concatenates_jobs():
    code = """
    functions {
      vector job(vector phi, vector theta, data array[] real x_r,
                 data array[] int x_i) {
        return [phi[1] * theta[1] + x_r[1] + x_i[1]]';
      }
    }
    data { int J; array[J] vector[1] thetas; array[J, 1] real xrs;
           array[J, 1] int xis; }
    parameters { real phi; }
    transformed parameters {
      vector[J] out = map_rect(job, [phi]', thetas, xrs, xis);
    }
    model { phi ~ normal(0, 1); }
    """
    m = nutpie_tpu.compile_stan_model(code=code).with_data(
        J=3, thetas=np.array([[1.0], [2.0], [3.0]]),
        xrs=np.array([[0.5], [0.5], [0.5]]),
        xis=np.array([[1], [2], [3]], dtype=np.int64),
    )
    tr = nutpie_tpu.sample(m, chains=1, tune=50, draws=50, seed=0,
                           progress_bar=False)
    out = np.asarray(tr.posterior["out"].values)
    phi = np.asarray(tr.posterior["phi"].values)
    expect = (phi[..., None] * np.array([1.0, 2.0, 3.0]) + 0.5
              + np.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(out, expect, atol=1e-8)


def test_integrate_1d_finite_and_infinite_bounds():
    # finite [0,1]; semi-infinite with a PARAMETER in the integrand
    # (gradient flows through the quadrature); doubly-infinite Gaussian
    code = """
    functions {
      real f1(real x, real xc, array[] real theta, data array[] real x_r,
              data array[] int x_i) { return x ^ 2; }
      real f2(real x, real xc, array[] real theta, data array[] real x_r,
              data array[] int x_i) { return exp(-theta[1] * x); }
      real f3(real x, real xc, array[] real theta, data array[] real x_r,
              data array[] int x_i) {
        return exp(-0.5 * (x - theta[1])^2) / sqrt(2 * pi());
      }
    }
    data { array[0] real xr; array[0] int xi; }
    parameters { real<lower=0.2> lam; }
    transformed parameters {
      real I1 = integrate_1d(f1, 0.0, 1.0, {0.0}, xr, xi);
      real I2 = integrate_1d(f2, 0.0, positive_infinity(), {lam}, xr, xi);
      real I3 = integrate_1d(f3, negative_infinity(), positive_infinity(),
                             {1.5}, xr, xi);
    }
    model { lam ~ lognormal(0, 0.3); }
    """
    m = nutpie_tpu.compile_stan_model(code=code).with_data(
        xr=np.zeros(0), xi=np.zeros(0, np.int64))
    tr = nutpie_tpu.sample(m, chains=1, tune=100, draws=100, seed=1,
                           progress_bar=False)
    I1 = np.asarray(tr.posterior["I1"].values)
    I2 = np.asarray(tr.posterior["I2"].values)
    I3 = np.asarray(tr.posterior["I3"].values)
    lam = np.asarray(tr.posterior["lam"].values)
    np.testing.assert_allclose(I1, 1 / 3, atol=1e-8)
    np.testing.assert_allclose(I2, 1 / lam, atol=1e-6)
    np.testing.assert_allclose(I3, 1.0, atol=1e-6)


def test_ode_solvers_old_and_new_interfaces():
    """Exponential decay with the rate as a sampled parameter: the
    odeint adjoint supplies the NUTS gradient; old and new interfaces
    must agree exactly (same integrator)."""
    code = """
    functions {
      vector decay(real t, vector y, real k) { return -k * y; }
      array[] real decay_old(real t, array[] real y, array[] real theta,
                             data array[] real x_r, data array[] int x_i) {
        array[1] real dydt;
        dydt[1] = -theta[1] * y[1];
        return dydt;
      }
    }
    data { int T; array[T] real ts; array[T] real yobs;
           array[0] real xr; array[0] int xi; }
    parameters { real<lower=0> k; }
    transformed parameters {
      array[T] vector[1] mu = ode_rk45(decay, [10.0]', 0.0, ts, k);
      array[T, 1] real mu_old =
          integrate_ode_rk45(decay_old, {10.0}, 0.0, ts, {k}, xr, xi);
    }
    model {
      k ~ lognormal(0, 1);
      for (t in 1:T) yobs[t] ~ normal(mu[t][1], 0.1);
    }
    """
    ts = np.array([0.25, 0.5, 0.75, 1.0, 1.5, 2.0])
    k_true = 0.8
    yobs = 10.0 * np.exp(-k_true * ts)
    m = nutpie_tpu.compile_stan_model(code=code).with_data(
        T=len(ts), ts=ts, yobs=yobs, xr=np.zeros(0),
        xi=np.zeros(0, np.int64))
    tr = nutpie_tpu.sample(m, chains=2, tune=300, draws=300, seed=2,
                           progress_bar=False)
    k = np.asarray(tr.posterior["k"].values)
    mu = np.asarray(tr.posterior["mu"].values)
    mu_old = np.asarray(tr.posterior["mu_old"].values)
    assert abs(k.mean() - k_true) < 0.05
    np.testing.assert_array_equal(mu[..., 0], mu_old[..., 0])
    analytic = 10.0 * np.exp(-k[..., None] * ts)
    assert np.abs(mu[..., 0] - analytic).max() < 1e-4


def test_algebra_solvers_implicit_gradient():
    """Root of y^2 - theta feeds the likelihood, so sampling requires the
    implicit-function-theorem gradient from lax.custom_root; solve_newton
    checks the variadic interface."""
    code = """
    functions {
      vector g(vector y, vector theta, data array[] real x_r,
               data array[] int x_i) {
        return [y[1]^2 - theta[1]]';
      }
      vector g2(vector y, real a) { return [y[1]^3 - a]'; }
    }
    data { real yobs; array[0] real xr; array[0] int xi; }
    parameters { real<lower=0.1> theta; }
    transformed parameters {
      vector[1] root = algebra_solver(g, [1.0]', [theta]', xr, xi);
      vector[1] root2 = solve_newton(g2, [1.0]', 8.0);
    }
    model {
      theta ~ lognormal(1, 0.5);
      yobs ~ normal(root[1], 0.05);
    }
    """
    m = nutpie_tpu.compile_stan_model(code=code).with_data(
        yobs=2.0, xr=np.zeros(0), xi=np.zeros(0, np.int64))
    tr = nutpie_tpu.sample(m, chains=2, tune=300, draws=300, seed=3,
                           progress_bar=False)
    theta = np.asarray(tr.posterior["theta"].values)
    root = np.asarray(tr.posterior["root"].values)
    root2 = np.asarray(tr.posterior["root2"].values)
    assert abs(theta.mean() - 4.0) < 0.4  # sqrt(theta) pinned near 2
    np.testing.assert_allclose(root[..., 0], np.sqrt(theta), atol=1e-6)
    np.testing.assert_allclose(root2, 2.0, atol=1e-6)


def _brute_force_hmm(log_omega, Gamma, rho):
    K, N = log_omega.shape
    tot = -np.inf
    marg = np.zeros((K, N))
    paths = []
    for path in itertools.product(range(K), repeat=N):
        lp = np.log(rho[path[0]]) + log_omega[path[0], 0]
        for n in range(1, N):
            lp += np.log(Gamma[path[n - 1], path[n]]) + log_omega[path[n], n]
        paths.append((path, lp))
        tot = np.logaddexp(tot, lp)
    for path, lp in paths:
        for n in range(N):
            marg[path[n], n] += np.exp(lp)
    marg /= np.exp(tot)
    return tot, marg


def test_hmm_functions_vs_enumeration():
    import jax
    import jax.numpy as jnp
    from nutpie_tpu.frontends.stan.stanlib import (
        hmm_hidden_state_prob,
        hmm_latent_rng,
        hmm_marginal,
    )

    K, N = 2, 4
    rng = np.random.default_rng(0)
    log_omega = rng.normal(size=(K, N))
    Gamma = np.array([[0.9, 0.1], [0.3, 0.7]])
    rho = np.array([0.6, 0.4])
    tot, marg = _brute_force_hmm(log_omega, Gamma, rho)

    assert abs(float(hmm_marginal(log_omega, Gamma, rho)) - tot) < 1e-9
    hp = np.asarray(hmm_hidden_state_prob(log_omega, Gamma, rho))
    np.testing.assert_allclose(hp, marg, atol=1e-9)

    # forward-filter backward-sample: per-position frequencies converge
    # to the exact marginals (one jitted vmap over keys, not 2000
    # compilations)
    keys = jax.random.split(jax.random.PRNGKey(0), 2000)
    draws = np.asarray(jax.jit(jax.vmap(
        lambda k: hmm_latent_rng(k, jnp.asarray(log_omega),
                                 jnp.asarray(Gamma), jnp.asarray(rho))
    ))(keys))
    assert draws.min() >= 1 and draws.max() <= K
    freq = np.stack([(draws == k + 1).mean(axis=0) for k in range(K)])
    assert np.abs(freq - marg).max() < 0.04


def test_hmm_marginal_in_model_and_latent_rng_in_gq():
    """End-to-end: hmm_marginal in the likelihood (gradient through the
    forward scan) and hmm_latent_rng in generated quantities."""
    code = """
    data { int N; array[N] real y; }
    parameters { real mu1; }
    transformed parameters {
      matrix[2, N] log_omega;
      for (n in 1:N) {
        log_omega[1, n] = normal_lpdf(y[n] | mu1, 1);
        log_omega[2, n] = normal_lpdf(y[n] | -2, 1);
      }
    }
    model {
      mu1 ~ normal(2, 1);
      target += hmm_marginal(log_omega,
                             [[0.9, 0.1], [0.2, 0.8]],
                             [0.5, 0.5]');
    }
    generated quantities {
      array[N] int z = hmm_latent_rng(log_omega,
                                      [[0.9, 0.1], [0.2, 0.8]],
                                      [0.5, 0.5]');
    }
    """
    rng = np.random.default_rng(1)
    y = np.concatenate([rng.normal(2.0, 1.0, 6), rng.normal(-2.0, 1.0, 6)])
    m = nutpie_tpu.compile_stan_model(code=code).with_data(N=12, y=y)
    tr = nutpie_tpu.sample(m, chains=2, tune=200, draws=200, seed=4,
                           progress_bar=False)
    mu1 = np.asarray(tr.posterior["mu1"].values)
    z = np.asarray(tr.posterior["z"].values)
    assert abs(mu1.mean() - 2.0) < 0.6
    assert z.min() >= 1 and z.max() <= 2
    # the first block of observations comes from state 1
    assert (z[..., :3] == 1).mean() > 0.8


def test_ode_adjoint_tol_ctl():
    """ode_adjoint_tol_ctl rides the same adjoint-differentiated
    integrator as ode_*_tol: with forward tolerances equal to the _tol
    call's (and backward/quadrature no tighter), solutions agree to
    solver tolerance and the sampled rate's gradient flows through."""
    code = """
    functions {
      vector decay(real t, vector y, real k) { return -k * y; }
    }
    data { int T; array[T] real ts; array[T] real yobs; }
    parameters { real<lower=0> k; }
    transformed parameters {
      array[T] vector[1] mu = ode_adjoint_tol_ctl(
          decay, [10.0]', 0.0, ts,
          1e-8, [1e-8]', 1e-8, [1e-8]', 1e-8, 1e-8,
          1000000, 150, 1, 1, 2, k);
      array[T] vector[1] mu_tol =
          ode_rk45_tol(decay, [10.0]', 0.0, ts, 1e-8, 1e-8, 1000000, k);
    }
    model {
      k ~ lognormal(0, 1);
      for (t in 1:T) yobs[t] ~ normal(mu[t][1], 0.1);
    }
    """
    ts = np.array([0.25, 0.5, 1.0, 2.0])
    k_true = 0.8
    yobs = 10.0 * np.exp(-k_true * ts)
    m = nutpie_tpu.compile_stan_model(code=code).with_data(
        T=len(ts), ts=ts, yobs=yobs)
    tr = nutpie_tpu.sample(m, chains=2, tune=300, draws=300, seed=3,
                           progress_bar=False)
    k = np.asarray(tr.posterior["k"].values)
    mu = np.asarray(tr.posterior["mu"].values)
    mu_tol = np.asarray(tr.posterior["mu_tol"].values)
    assert abs(k.mean() - k_true) < 0.05
    np.testing.assert_allclose(mu[..., 0], mu_tol[..., 0], atol=1e-6)
    analytic = 10.0 * np.exp(-k[..., None] * ts)
    assert np.abs(mu[..., 0] - analytic).max() < 1e-5


def test_dae_solvers_index1_gradient():
    """Index-1 linear DAE (one differential + one algebraic equation)
    with the decay rate as a sampled parameter: y1' = -k y1, y2 = y1.
    The TR-BDF2 stages solve under lax.custom_root, so NUTS gradients
    flow through every implicit stage; the consistent yp0 is built from
    the parameter inside the program."""
    code = """
    functions {
      vector res(real t, vector yy, vector yp, real k) {
        return [yp[1] + k * yy[1], yy[2] - yy[1]]';
      }
    }
    data { int T; array[T] real ts; array[T] real yobs; }
    parameters { real<lower=0> k; }
    transformed parameters {
      array[T] vector[2] mu = dae_tol(
          res, [1.0, 1.0]', [-k, -k]', 0.0, ts,
          1e-4, 1e-8, 100000, k);
    }
    model {
      k ~ lognormal(0, 1);
      for (t in 1:T) yobs[t] ~ normal(mu[t][1], 0.05);
    }
    """
    ts = np.array([0.25, 0.5, 1.0, 2.0])
    k_true = 0.8
    yobs = np.exp(-k_true * ts)
    m = nutpie_tpu.compile_stan_model(code=code).with_data(
        T=len(ts), ts=ts, yobs=yobs)
    tr = nutpie_tpu.sample(m, chains=2, tune=200, draws=200, seed=5,
                           progress_bar=False)
    k = np.asarray(tr.posterior["k"].values)
    mu = np.asarray(tr.posterior["mu"].values)
    assert abs(k.mean() - k_true) < 0.06, k.mean()
    analytic = np.exp(-k[..., None] * ts)
    # 2nd-order fixed grid at rel_tol 1e-4: global error ~ 1e-4
    assert np.abs(mu[..., 0] - analytic).max() < 1e-3
    # the algebraic constraint holds at every output time
    assert np.abs(mu[..., 1] - mu[..., 0]).max() < 1e-6


def test_dae_default_interface_and_budget_error():
    """dae() with default tolerances matches dae_tol tightly; an
    undersized max_num_steps errors with the intentional message."""
    from nutpie_tpu.frontends.stan.errors import StanCompileError

    code = """
    functions {
      vector res(real t, vector yy, vector yp) {
        return [yp[1] + yy[1]]';
      }
    }
    data { int T; array[T] real ts; }
    parameters { real x; }
    transformed parameters {
      array[T] vector[1] sol = dae(res, [1.0]', [-1.0]', 0.0, ts);
    }
    model { x ~ normal(0, 1); }
    """
    ts = np.array([0.5, 1.0])
    m = nutpie_tpu.compile_stan_model(code=code).with_data(T=2, ts=ts)
    tr = nutpie_tpu.sample(m, chains=1, tune=50, draws=50, seed=0,
                           progress_bar=False)
    sol = np.asarray(tr.posterior["sol"].values)
    np.testing.assert_allclose(
        sol[0, 0, :, 0], np.exp(-ts), atol=2e-5
    )

    bad = code.replace("dae(res, [1.0]', [-1.0]', 0.0, ts)",
                       "dae_tol(res, [1.0]', [-1.0]', 0.0, ts, "
                       "1e-4, 1e-8, 10)")
    mb = nutpie_tpu.compile_stan_model(code=bad).with_data(T=2, ts=ts)
    with pytest.raises(StanCompileError, match="max_num_steps"):
        nutpie_tpu.sample(mb, chains=1, tune=5, draws=5, seed=0,
                          progress_bar=False)
