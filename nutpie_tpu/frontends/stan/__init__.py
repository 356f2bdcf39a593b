"""Stan frontend: a Stan -> JAX compiler for TPU sampling.

The reference compiles Stan models through BridgeStan (stanc -> C++ -> .so,
dlopened and called per gradient from Rust; ``src/stan.rs``).  A C++ shared
library cannot run on a TPU, so this frontend implements the component the
reference outsources: a compiler for the Stan modeling language targeting
JAX.  The model's log density -- constraint transforms with Jacobians,
transformed parameters, and the model block -- becomes a traceable function
fused into the sampler's XLA program; ``generated quantities`` and
constrained parameters are produced by the expand function.

Supported: the core Stan language (data/transformed data/parameters/
transformed parameters/model/generated quantities blocks, scalar/vector/
matrix/array types, lower/upper/simplex/ordered/... constraints, control
flow, the common distributions and math library).  Unsupported constructs
raise ``StanCompileError`` at compile time with a source location.

API parity: ``compile_stan_model(code=..., filename=...)`` and
``CompiledStanModel.with_data(...)`` mirror the reference
(``python/nutpie/compile_stan.py:250-386``).  The compile cache and
``prune_stan_cache`` exist for API compatibility but are trivial: parsing
is milliseconds, and XLA compilation is cached by JAX itself.
"""

from .api import CompiledStanModel, compile_stan_model, prune_stan_cache
from .errors import StanCompileError, StanRuntimeError

__all__ = [
    "compile_stan_model",
    "CompiledStanModel",
    "prune_stan_cache",
    "StanCompileError",
    "StanRuntimeError",
]
