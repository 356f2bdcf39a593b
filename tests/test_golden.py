"""Golden seeded-draw regression tests.

Analog of the reference's pytest-arraydiff golden files
(``tests/reference/test_deterministic_sampling_*.txt``,
``tests/test_pymc.py:533-552``): the full sampler given a fixed seed is a
determinism contract.  Golden arrays are committed under
``tests/reference/``; regenerate with
``python tests/test_golden.py --regenerate`` after intentional algorithm
changes (as the reference does when window semantics change,
``CHANGELOG.md:124``).
"""

import sys
from pathlib import Path

if __name__ == "__main__":
    # direct invocation (--regenerate): mirror conftest's environment so
    # golden draws match what pytest produces
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest

import nutpie_tpu
from nutpie_tpu.frontends.pyfunc import compile_model_def
from nutpie_tpu.models import eight_schools, funnel, std_normal

REFERENCE = Path(__file__).parent / "reference"

_STAN_GOLDEN_CODE = """
data { int N; vector[N] y; }
parameters { real mu; real<lower=0> sigma; }
model {
  mu ~ normal(0, 5);
  sigma ~ normal(0, 2);
  y ~ normal(mu, sigma);
}
generated quantities {
  real y_rep = normal_rng(mu, sigma);
}
"""


def _stan_golden_model():
    rng = np.random.default_rng(13)
    y = 1.5 + 0.8 * rng.standard_normal(50)
    return nutpie_tpu.compile_stan_model(code=_STAN_GOLDEN_CODE).with_data(
        N=50, y=y
    )


def _golden_cases():
    return {
        "std_normal": dict(
            model=compile_model_def(std_normal(3, mu=1.0, sigma=2.0)),
            kwargs=dict(chains=2, draws=100, tune=100, seed=2026),
            var="x",
        ),
        "eight_schools": dict(
            model=compile_model_def(eight_schools()),
            kwargs=dict(chains=2, draws=100, tune=150, seed=2026),
            var="mu",
        ),
        # frontend coverage: the full Stan compiler stack + GQ rng streams
        # (reference commits a stan golden, tests/test_stan.py:282-302)
        "stan_mu": dict(
            model=_stan_golden_model,
            kwargs=dict(chains=2, draws=100, tune=150, seed=2026),
            var="mu",
        ),
        "stan_y_rep": dict(
            model=_stan_golden_model,
            kwargs=dict(chains=2, draws=100, tune=150, seed=2026),
            var="y_rep",
        ),
        # a 4-chain x 500-draw config (VERDICT r2 #9)
        "four_chain": dict(
            model=compile_model_def(std_normal(2)),
            kwargs=dict(chains=4, draws=500, tune=200, seed=2026),
            var="x",
        ),
        # flow adaptation golden (reference test_normalizing_flow.txt)
        "flow_funnel": dict(
            model=compile_model_def(funnel(dim=4)),
            kwargs=dict(chains=2, draws=150, tune=400, seed=2026,
                        adaptation="flow"),
            var="v",
        ),
    }


def _run(case):
    model = case["model"]
    if callable(model) and not hasattr(model, "n_dim"):
        model = model()
    trace = nutpie_tpu.sample(
        model, progress_bar=False, **case["kwargs"]
    )
    return np.asarray(trace.posterior[case["var"]].values)


@pytest.mark.parametrize("name", sorted(_golden_cases()))
def test_golden_draws(name):
    case = _golden_cases()[name]
    path = REFERENCE / f"{name}.npy"
    if not path.exists():
        pytest.skip(f"golden file {path} missing; run --regenerate")
    expected = np.load(path)
    actual = _run(case)
    np.testing.assert_allclose(actual, expected, rtol=1e-4, atol=1e-4)


def test_same_platform_rerun_is_bitwise():
    """Same seed, same platform, same process: draws must be bit-identical
    across reruns (reference max-ULP assertion, tests/test_stan.py:300-301;
    threefry keys + deterministic XLA:CPU make 0 ULP achievable)."""
    case = _golden_cases()["std_normal"]
    a = _run(case)
    b = _run(case)
    ulp = np.abs(a.view(np.int64) - b.view(np.int64))
    assert ulp.max() == 0, f"max ULP distance {ulp.max()}"


if __name__ == "__main__":
    import sys

    if "--regenerate" in sys.argv:
        REFERENCE.mkdir(exist_ok=True)
        for name, case in _golden_cases().items():
            np.save(REFERENCE / f"{name}.npy", _run(case))
            print(f"wrote {name}")
