"""Builtin model zoo: analytic test posteriors and benchmark models.

These serve the role of the reference's test fixtures (tiny real models) and
the BASELINE.json benchmark configs: the Stan README normal model, Neal's
funnel, an ill-conditioned Gaussian, a radon-style hierarchical model, and a
logistic GLM.
"""

from .analytic import (
    eight_schools,
    funnel,
    hierarchical_funnel,
    student_t_funnel,
    ill_conditioned_gaussian,
    logistic_glm,
    std_normal,
)
from .radon import radon

__all__ = [
    "std_normal",
    "funnel",
    "hierarchical_funnel",
    "student_t_funnel",
    "ill_conditioned_gaussian",
    "eight_schools",
    "logistic_glm",
    "radon",
]
