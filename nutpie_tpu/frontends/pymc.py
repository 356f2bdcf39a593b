"""PyMC frontend: compile a PyMC model straight to the XLA sampler.

TPU-native analog of the reference's ``compile_pymc_model``
(``python/nutpie/compile_pymc.py:523-624``).  Where the reference offers a
numba path (C-ABI function pointers consumed by Rust,
``compile_pymc.py:970-1043``) and a JAX path, only the JAX path makes sense
on TPU: the PyTensor graph is lowered to JAX with PyTensor's JAX linker and
compiled *into* the sampler's XLA program, so one fused kernel evaluates
logp+gradient for the whole chain batch.

Mirrored semantics:
- flat f64 unconstrained vector joining all free RVs (``_make_functions``,
  ``compile_pymc.py:668-871``)
- expand function computing deterministics + constrained RVs
- dims/coords and the ``unconstrained_parameter`` coordinate labels
  (``compile_pymc.py:370-407``)
- seeded jittered initial points (``compile_pymc.py:584-604``)
- ``with_data`` swapping shared variables (``compile_pymc.py:239-269``)
- ``freeze_model`` / ``var_names`` options

Requires ``pymc`` and ``pytensor`` (not bundled); importing this module
without them raises ImportError.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import numpy as np

from ..model import CompiledModel, ModelDef, make_model


def _flat_jitter_mask(order, sizes, offsets, ndim, jitter_value_names,
                      enable=True):
    """0/1 mask over the flat unconstrained vector selecting the value-var
    slices that receive U(-1,1) init jitter (reference semantics:
    ``jitter_rvs`` limits jitter to those RVs; ``adapt_diag`` strategy
    disables it entirely; ``compile_pymc.py:584-604``).  Pure numpy --
    unit-testable without pymc."""
    mask = np.zeros(ndim)
    if not enable:
        return mask
    for name in order:
        if jitter_value_names is None or name in jitter_value_names:
            mask[offsets[name] : offsets[name] + sizes[name]] = 1.0
    return mask


def _require_pymc():
    try:
        import pymc  # noqa: F401
        import pytensor  # noqa: F401
    except ImportError as err:
        raise ImportError(
            "compile_pymc_model requires pymc and pytensor to be installed"
        ) from err


def _jaxify(inputs, outputs):
    """Lower a PyTensor graph to a traceable JAX callable."""
    from pytensor.compile.mode import get_mode
    from pytensor.graph.fg import FunctionGraph
    from pytensor.graph.rewriting.basic import GraphRewriter
    from pytensor.link.jax.dispatch import jax_funcify

    mode = get_mode("JAX")
    graph = FunctionGraph(inputs=inputs, outputs=list(outputs), clone=True)
    rewriter = mode.optimizer
    if isinstance(rewriter, GraphRewriter):
        rewriter.rewrite(graph)
    else:
        rewriter(graph)
    return jax_funcify(graph)


@dataclasses.dataclass(frozen=True)
class CompiledPyMCModel(CompiledModel):
    """Compiled PyMC model (JAX backend)."""

    _model: Any = None
    _var_names: Optional[tuple] = None
    _gradient_backend: str = "jax"
    _shared_overrides: dict = dataclasses.field(default_factory=dict)
    _jitter_scale: float = 1.0
    _transform_adapt_args: dict = dataclasses.field(default_factory=dict)
    # freeze_dims_and_data is applied lazily at _make_model time, AFTER
    # with_data overrides: freezing first turns pm.Data into constants that
    # pm.set_data can no longer update (the reference keeps the same order,
    # compile_pymc.py:584-591 vs with_data)
    _freeze: bool = True
    _initial_points: Optional[dict] = None
    _jitter_names: Optional[tuple] = None  # None = jitter all free RVs
    _init_strategy: str = "jitter+adapt_diag"

    def __post_init__(self):
        object.__setattr__(self, "coords", dict(self._model.coords))
        import pymc as pm  # noqa: F401

        dims = {
            name: tuple(d)
            for name, d in getattr(self._model, "named_vars_to_dims", {}).items()
        }
        object.__setattr__(self, "dims", dims)

    @property
    def n_dim(self) -> int:
        ip = self._model.initial_point(random_seed=0)
        return int(sum(np.asarray(v).size for v in ip.values()))

    def with_data(self, **updates: Any) -> "CompiledPyMCModel":
        """Return a copy with shared (pm.Data) variables replaced.

        Shape validation happens when pm.set_data applies the overrides at
        ``_make_model`` time.
        """
        merged = dict(self._shared_overrides)
        for key, value in updates.items():
            merged[key] = np.asarray(value)
        return dataclasses.replace(self, _shared_overrides=merged)

    def _make_model(self, seed: int) -> ModelDef:
        import jax
        import jax.numpy as jnp
        import pymc as pm
        from pymc.initial_point import make_initial_point_fn

        model = self._model
        if self._shared_overrides:
            with model:
                pm.set_data(
                    {k: v for k, v in self._shared_overrides.items()},
                    model=model,
                )
        if self._freeze:
            from pymc.model.transform.optimization import freeze_dims_and_data

            model = freeze_dims_and_data(model)

        value_vars = list(model.value_vars)
        ip = model.initial_point(random_seed=seed)
        order = [v.name for v in value_vars]
        shapes = {name: np.asarray(ip[name]).shape for name in order}
        sizes = {name: int(np.prod(shapes[name], dtype=int)) for name in order}
        ndim = sum(sizes.values())

        # ---- logp (+grad via jax) on the flat vector
        logp_graph = model.logp(jacobian=True, sum=True)
        logp_parts = _jaxify(value_vars, [logp_graph])

        offsets = {}
        off = 0
        for name in order:
            offsets[name] = off
            off += sizes[name]

        def split(x):
            return [
                x[offsets[name] : offsets[name] + sizes[name]].reshape(shapes[name])
                for name in order
            ]

        def logp_fn(x):
            (out,) = logp_parts(*split(x))
            return jnp.asarray(out)

        # gradient_backend="pytensor": derive the gradient graph in
        # PyTensor (its rewrites see the original graph) and lower
        # logp+grads to JAX together (reference compile_pymc.py:449-520);
        # "jax" differentiates the lowered logp with jax.value_and_grad
        logp_grad_fn = None
        if self._gradient_backend == "pytensor":
            import pytensor.tensor as pt

            grad_graphs = pt.grad(logp_graph, value_vars)
            both_parts = _jaxify(value_vars, [logp_graph, *grad_graphs])

            def logp_grad_fn(x):
                outs = both_parts(*split(x))
                lp = jnp.asarray(outs[0])
                grad = jnp.concatenate([
                    jnp.asarray(g).reshape(-1).astype(x.dtype)
                    for g in outs[1:]
                ]) if ndim else jnp.zeros_like(x)
                return lp, grad

        # ---- expand: constrained RVs + deterministics
        from pymc.util import get_default_varnames

        vars_to_sample = list(
            get_default_varnames(
                model.unobserved_value_vars, include_transformed=False
            )
        )
        if self._var_names is not None:
            keep = set(self._var_names)
            vars_to_sample = [v for v in vars_to_sample if v.name in keep]
        expand_parts = _jaxify(value_vars, vars_to_sample)
        expand_names = [v.name for v in vars_to_sample]

        def expand_fn(x):
            outs = expand_parts(*split(x))
            return {name: jnp.asarray(o) for name, o in zip(expand_names, outs)}

        # expanded shapes from one host evaluation at the initial point
        flat_ip = np.concatenate(
            [np.asarray(ip[name], np.float64).ravel() for name in order]
        ) if ndim else np.zeros(0)
        probe = jax.eval_shape(expand_fn, jnp.zeros(ndim))
        dims_lookup = dict(self.dims)

        def _guard_dims(name, shape):
            # rank-mismatched dims fall back to auto-generated names (same
            # guard as the param vars below; None entries are filled by
            # resolve_variables per reference common.rs:302-379)
            dims = dims_lookup.get(name)
            if dims is not None and len(dims) != len(shape):
                return None
            return dims

        expanded_vars = [
            (name, np.dtype(np.float64), tuple(probe[name].shape),
             _guard_dims(name, probe[name].shape))
            for name in expand_names
        ]
        param_vars = []
        reparameterized = []
        for name in order:
            dims = dims_lookup.get(name)
            if dims is not None and len(dims) != len(shapes[name]):
                dims = None
            param_vars.append(
                (name, np.dtype(np.float64), shapes[name], dims)
            )
            if name not in expand_names:
                reparameterized.append(name)

        # ---- initial point function: pymc's seeded init (+ user
        # initial_points overrides) with per-RV jitter control (reference
        # compile_pymc.py:584-604: initial_points / jitter_rvs /
        # default_initialization_strategy)
        overrides = None
        if self._initial_points is not None:
            overrides = {
                rv: self._initial_points[rv.name]
                for rv in model.free_RVs
                if rv.name in self._initial_points
            }
        ipfn = make_initial_point_fn(
            model=model,
            jitter_rvs=set(),
            overrides=overrides,
            return_transformed=True,
        )
        base_point = ipfn(seed)
        base_flat = np.concatenate(
            [np.asarray(base_point[name], np.float64).ravel() for name in order]
        ) if ndim else np.zeros(0)
        # map requested jitter RV names (untransformed) to value-var slices
        rv_to_value = {
            rv.name: value.name
            for rv, value in zip(model.free_RVs, model.value_vars)
        }
        jitter_value_names = (
            None if self._jitter_names is None
            else {rv_to_value.get(n, n) for n in self._jitter_names}
        )
        jitter_mask = _flat_jitter_mask(
            order, sizes, offsets, ndim, jitter_value_names,
            enable=self._init_strategy.startswith("jitter"),
        )
        jitter_scale = self._jitter_scale
        base_flat_j = jnp.asarray(base_flat)
        jitter_mask_j = jnp.asarray(jitter_mask)

        def init_point_fn(key, init_mean):
            jitter = jax.random.uniform(
                key, (ndim,), minval=-jitter_scale, maxval=jitter_scale,
                dtype=init_mean.dtype,
            )
            return (
                base_flat_j.astype(init_mean.dtype)
                + jitter_mask_j.astype(init_mean.dtype) * jitter
            )

        del flat_ip
        return make_model(
            ndim,
            logp_fn,
            expand_fn=expand_fn,
            expanded_vars=expanded_vars,
            param_vars=param_vars,
            coords={k: list(v) for k, v in model.coords.items() if v is not None},
            init_point_fn=init_point_fn,
            reparameterized_names=reparameterized,
            logp_grad_fn=logp_grad_fn,
        )


def compile_pymc_model(
    model,
    *,
    backend: str = "jax",
    gradient_backend: str = "jax",
    initial_points=None,
    jitter_rvs=None,
    var_names: Optional[Sequence[str]] = None,
    freeze_model: Optional[bool] = None,
    **kwargs,
) -> CompiledPyMCModel:
    """Compile a PyMC model for sampling (reference ``compile_pymc.py:523``).

    Only ``backend="jax"`` is supported on TPU; ``backend="numba"`` raises
    (the numba C-ABI path exists for CPU-Rust interop and has no TPU
    equivalent -- the JAX path is strictly more capable here).
    """
    _require_pymc()
    if backend not in ("jax", None):
        raise ValueError(
            "nutpie_tpu only supports backend='jax' (the numba backend is a "
            "CPU/Rust-specific mechanism; on TPU the PyTensor graph is "
            "compiled through JAX/XLA)"
        )
    if freeze_model is None:
        freeze_model = True
    strategy = kwargs.pop("default_initialization_strategy", "jitter+adapt_diag")
    if strategy not in ("jitter+adapt_diag", "adapt_diag"):
        raise ValueError(
            f"Unknown default_initialization_strategy: {strategy!r}"
        )
    if gradient_backend not in ("jax", "pytensor", None):
        raise ValueError(
            f"Unknown gradient_backend: {gradient_backend!r}"
        )
    return CompiledPyMCModel(
        _model=model,
        _var_names=tuple(var_names) if var_names is not None else None,
        _gradient_backend=gradient_backend,
        _freeze=bool(freeze_model),
        _initial_points=dict(initial_points) if initial_points else None,
        _jitter_names=(
            tuple(
                rv if isinstance(rv, str) else rv.name for rv in jitter_rvs
            )
            if jitter_rvs is not None else None
        ),
        _init_strategy=strategy,
    )
