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

from pathlib import Path

import numpy as np
import pytest

import nutpie_tpu
from nutpie_tpu.frontends.pyfunc import compile_model_def
from nutpie_tpu.models import eight_schools, std_normal

REFERENCE = Path(__file__).parent / "reference"


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
    }


def _run(case):
    trace = nutpie_tpu.sample(
        case["model"], progress_bar=False, **case["kwargs"]
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


if __name__ == "__main__":
    import sys

    if "--regenerate" in sys.argv:
        REFERENCE.mkdir(exist_ok=True)
        for name, case in _golden_cases().items():
            np.save(REFERENCE / f"{name}.npy", _run(case))
            print(f"wrote {name}")
