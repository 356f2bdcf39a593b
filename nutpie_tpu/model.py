"""The model ABI: what the TPU sampler core consumes.

The reference's model contract is a C-ABI function-pointer protocol
(``CpuLogpFunc`` with ``logp(&[f64], &mut [f64]) -> f64`` plus
``expand_vector``; reference ``src/pymc.rs:188-409``).  The TPU-native
equivalent is a *traceable JAX function*: ``logp_fn(x: f[dim]) -> f[]`` whose
gradient is taken with ``jax.value_and_grad`` and which is compiled straight
into the sampler's XLA program, so one fused kernel evaluates logp+grad for
thousands of chains at once.

Error protocol: the reference maps recoverable logp failures to divergences
(``LogpError::is_recoverable``, ``src/pymc.rs:166-181``).  In-graph the same
semantics fall out of NaN/-inf propagation: a nonfinite logp or gradient makes
the trajectory's energy error nonfinite, which the NUTS kernel treats as a
divergence and continues sampling.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .variables import Variable, resolve_variables, unconstrained_coord_labels


@dataclasses.dataclass(frozen=True)
class ModelDef:
    """A fully-resolved model, ready for the sampler core.

    Attributes
    ----------
    ndim:
        Dimension of the unconstrained parameter vector.
    logp_fn:
        Traceable ``x[ndim] -> scalar`` log density.
    expand_fn:
        Traceable ``x[ndim] -> dict[name, array]`` posterior expansion
        (constrained parameters, deterministics, generated quantities).
        May be None, in which case the flat vector itself is stored.
    expanded_variables:
        Metadata for every key that ``expand_fn`` returns.
    param_variables:
        Metadata for the unconstrained parameter slices (used for the
        ``unconstrained_parameter`` coordinate and unconstrained groups).
    init_point_fn:
        Optional ``(key, init_mean[ndim]) -> x[ndim]`` initial-position
        generator.  Defaults to ``init_mean + U(-2, 2)`` (the reference's
        pyfunc default, ``src/pyfunc.rs:535-568``).
    """

    ndim: int
    logp_fn: Callable[[jax.Array], jax.Array]
    expand_fn: Optional[Callable[[jax.Array], dict[str, jax.Array]]] = None
    # when True, expand_fn has signature (x, key) -> dict (generated
    # quantities with RNG; the sampler supplies a per-(chain, draw) key)
    expand_needs_rng: bool = False
    expanded_variables: tuple[Variable, ...] = ()
    param_variables: tuple[Variable, ...] = ()
    dim_sizes: dict = dataclasses.field(default_factory=dict)
    coords: dict = dataclasses.field(default_factory=dict)
    init_point_fn: Optional[Callable[[jax.Array, jax.Array], jax.Array]] = None
    reparameterized_names: tuple[str, ...] = ()
    # optional fused x -> (logp, grad) override.  Default is
    # jax.value_and_grad(logp_fn); frontends that build the gradient graph
    # themselves (PyMC gradient_backend="pytensor", where PyTensor derives
    # the grad before lowering to JAX; reference compile_pymc.py:449-520)
    # install it here.
    logp_grad_fn: Optional[Callable] = None

    def __post_init__(self):
        if not self.param_variables:
            var = Variable(
                name="x",
                dtype=np.dtype(np.float64),
                shape=(self.ndim,),
                dims=("unconstrained_parameter",),
                start_idx=0,
                end_idx=self.ndim,
            )
            object.__setattr__(self, "param_variables", (var,))
        if self.expand_fn is None:
            object.__setattr__(
                self,
                "expand_fn",
                lambda x: {v.name: x[v.start_idx : v.end_idx].reshape(v.shape)
                           for v in self.param_variables},
            )
            if not self.expanded_variables:
                object.__setattr__(
                    self, "expanded_variables", tuple(self.param_variables)
                )

    @property
    def unconstrained_labels(self) -> list[str]:
        return unconstrained_coord_labels(self.param_variables)

    def logp_and_grad(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        if self.logp_grad_fn is not None:
            return self.logp_grad_fn(x)
        return jax.value_and_grad(self.logp_fn)(x)

    def initial_position(self, key: jax.Array, init_mean: jax.Array) -> jax.Array:
        if self.init_point_fn is not None:
            return self.init_point_fn(key, init_mean)
        jitter = jax.random.uniform(
            key, (self.ndim,), minval=-2.0, maxval=2.0, dtype=init_mean.dtype
        )
        return init_mean + jitter


class CompiledModel:
    """Base class for compiled models (reference ``sample.py:17-59``).

    Frontends (PyMC, Stan, pyfunc, builtin) subclass this; ``sample()``
    consumes it via ``_make_model``.
    """

    dims: dict[str, tuple[str, ...]]
    coords: dict[str, Any]

    def __init__(self, dims=None, coords=None):
        self.dims = dict(dims or {})
        self.coords = dict(coords or {})

    @property
    def n_dim(self) -> int:
        raise NotImplementedError

    @property
    def shapes(self) -> Optional[dict[str, tuple[int, ...]]]:
        model = self._make_model(0)
        return {v.name: v.shape for v in model.expanded_variables}

    def _make_model(self, seed: int) -> ModelDef:
        raise NotImplementedError

    def with_data(self, **updates: Any) -> "CompiledModel":
        raise NotImplementedError(
            f"{type(self).__name__} does not support with_data"
        )

    def with_transform_adapt(self, **kwargs: Any) -> "CompiledModel":
        merged = dict(getattr(self, "_transform_adapt_args", {}), **kwargs)
        if dataclasses.is_dataclass(self):
            return dataclasses.replace(self, _transform_adapt_args=merged)
        import copy

        new = copy.copy(self)
        new._transform_adapt_args = merged
        return new

    def benchmark_logp(self, point, num_evals: int, cores: int | Sequence[int] = 1):
        """Time gradient evaluations (reference ``sample.py:40-59``).

        On an accelerator the analog of "concurrent cores" is the number of
        chains evaluated in one batched call, so ``cores`` here is the batch
        size (list accepted).  Returns a pandas DataFrame when pandas is
        available, else a dict of columns.
        """
        model = self._make_model(0)
        point = jnp.asarray(point)
        if isinstance(cores, int):
            cores = [cores]
        times: dict[str, list] = {"batch": [], "time": [], "evals_per_sec": []}
        for batch in cores:
            xs = jnp.broadcast_to(point, (batch, model.ndim))
            fn = jax.jit(jax.vmap(model.logp_and_grad))
            out = fn(xs)
            jax.block_until_ready(out)
            start = time.perf_counter()
            for _ in range(num_evals):
                out = fn(xs)
            jax.block_until_ready(out)
            elapsed = (time.perf_counter() - start) / num_evals
            times["batch"].append(batch)
            times["time"].append(elapsed)
            times["evals_per_sec"].append(batch / elapsed)
        try:
            import pandas as pd

            return pd.DataFrame(times)
        except ImportError:  # pragma: no cover
            return times


def _as_variable_specs(variables: Sequence[Variable]):
    return [(v.name, v.dtype, v.shape, v.dims) for v in variables]


def make_model(
    ndim: int,
    logp_fn: Callable,
    *,
    expand_fn: Optional[Callable] = None,
    expanded_vars: Optional[
        Sequence[tuple[str, Any, tuple[int, ...], Optional[Sequence[str]]]]
    ] = None,
    param_vars: Optional[
        Sequence[tuple[str, Any, tuple[int, ...], Optional[Sequence[str]]]]
    ] = None,
    dims: Optional[dict] = None,
    coords: Optional[dict] = None,
    init_point_fn: Optional[Callable] = None,
    reparameterized_names: Sequence[str] = (),
    expand_needs_rng: bool = False,
    logp_grad_fn: Optional[Callable] = None,
) -> ModelDef:
    """Convenience constructor resolving variable metadata."""
    dim_sizes: dict[str, int] = {}
    if param_vars is not None:
        pvars, dim_sizes = resolve_variables(
            [(n, np.dtype(d), tuple(s), dm) for n, d, s, dm in param_vars], dim_sizes
        )
    else:
        pvars = None
    if expanded_vars is not None:
        evars, dim_sizes = resolve_variables(
            [(n, np.dtype(d), tuple(s), dm) for n, d, s, dm in expanded_vars],
            dim_sizes,
        )
    else:
        evars = None
    coords = dict(coords or {})
    if pvars is not None:
        total = sum(v.num_elements for v in pvars)
        if total != ndim:
            raise ValueError(
                f"param_vars cover {total} unconstrained elements but ndim is "
                f"{ndim} (JAX clamps out-of-bounds indexing silently, so a "
                f"mismatch here would corrupt the model)"
            )
    return ModelDef(
        ndim=ndim,
        logp_fn=logp_fn,
        expand_fn=expand_fn,
        expand_needs_rng=expand_needs_rng,
        expanded_variables=tuple(evars) if evars is not None else (),
        param_variables=tuple(pvars) if pvars is not None else (),
        dim_sizes=dim_sizes,
        coords=coords,
        init_point_fn=init_point_fn,
        reparameterized_names=tuple(reparameterized_names),
        logp_grad_fn=logp_grad_fn,
    )
