"""Generic Python-function frontend.

TPU-native analog of the reference's pyfunc backend
(``python/nutpie/compiled_pyfunc.py:108-155`` + ``src/pyfunc.rs``): the user
provides factory functions returning a logp function and optionally an
expand function.  Here the logp must be JAX-traceable -- it is compiled into
the sampler's XLA program rather than called through FFI per gradient.
For non-traceable logp functions the reference's GIL-per-call pattern has no
sensible TPU equivalent; wrap external code in ``jax.pure_callback``
yourself if you must (at a large performance cost).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import numpy as np

from ..model import CompiledModel, ModelDef, make_model


@dataclasses.dataclass(frozen=True)
class PyFuncModel(CompiledModel):
    """Compiled model wrapping user-supplied JAX functions."""

    _ndim: int = 0
    _make_logp_fn: Callable = None
    _make_expand_fn: Optional[Callable] = None
    _make_initial_point_fn: Optional[Callable] = None
    _expanded_vars: tuple = ()
    _param_vars: Optional[tuple] = None
    _coords: dict = dataclasses.field(default_factory=dict)
    _dims: dict = dataclasses.field(default_factory=dict)
    _shared_data: dict = dataclasses.field(default_factory=dict)
    _reparameterized_names: tuple = ()
    _transform_adapt_args: dict = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        object.__setattr__(self, "coords", dict(self._coords))
        object.__setattr__(self, "dims", dict(self._dims))

    @property
    def n_dim(self) -> int:
        return self._ndim

    @property
    def shapes(self):
        return {name: tuple(shape) for name, _, shape, _ in self._expanded_vars}

    def with_data(self, **updates: Any) -> "PyFuncModel":
        """Swap shared data without recompiling the Python-side model.

        (The XLA program does recompile on first use with new shapes;
        same-shaped data swaps reuse the compile cache through closure
        constants only when values are baked -- for frequently updated
        datasets pass them through ``shared_data`` and they are closed over
        per sample() call.)
        """
        shared = dict(self._shared_data)
        for key, value in updates.items():
            if key not in shared:
                raise KeyError(f"Unknown shared data variable: {key}")
            old = np.asarray(shared[key])
            new = np.asarray(value)
            if old.shape != new.shape:
                raise ValueError(
                    f"Shared variable {key} has shape {old.shape}, "
                    f"got {new.shape}"
                )
            shared[key] = new
        return dataclasses.replace(self, _shared_data=shared)

    def _make_model(self, seed: int) -> ModelDef:
        kwargs = dict(self._shared_data)
        logp_fn = (
            self._make_logp_fn(**kwargs) if kwargs else self._make_logp_fn()
        )
        expand_fn = None
        if self._make_expand_fn is not None:
            expand_fn = (
                self._make_expand_fn(**kwargs) if kwargs else self._make_expand_fn()
            )
        init_fn = None
        if self._make_initial_point_fn is not None:
            init_fn = (
                self._make_initial_point_fn(**kwargs)
                if kwargs
                else self._make_initial_point_fn()
            )
        return make_model(
            self._ndim,
            logp_fn,
            expand_fn=expand_fn,
            expanded_vars=list(self._expanded_vars) or None,
            param_vars=list(self._param_vars) if self._param_vars else None,
            coords=self._coords,
            init_point_fn=init_fn,
            reparameterized_names=self._reparameterized_names,
        )


def from_pyfunc(
    ndim: int,
    make_logp_fn: Callable,
    make_expand_fn: Optional[Callable] = None,
    expanded_dtypes: Optional[Sequence] = None,
    expanded_shapes: Optional[Sequence] = None,
    expanded_names: Optional[Sequence[str]] = None,
    *,
    coords: Optional[dict] = None,
    dims: Optional[dict] = None,
    shared_data: Optional[dict] = None,
    make_initial_point_fn: Optional[Callable] = None,
    raw_logp_fn: Optional[Callable] = None,
    reparameterized_names: Optional[Sequence[str]] = None,
    param_vars: Optional[Sequence] = None,
) -> PyFuncModel:
    """Build a compiled model from JAX-traceable functions.

    Signature mirrors the reference (``compiled_pyfunc.py:108-155``):
    ``make_logp_fn(**shared_data)`` must return a traceable
    ``x[ndim] -> scalar``; ``make_expand_fn(**shared_data)`` a traceable
    ``x[ndim] -> dict[str, array]`` whose outputs match
    ``expanded_names/shapes/dtypes``; ``raw_logp_fn`` is accepted for
    compatibility but unused (the traceable path IS the fast path here).
    """
    dims = dict(dims or {})
    expanded_vars = []
    if expanded_names is not None:
        if expanded_shapes is None or expanded_dtypes is None:
            raise ValueError(
                "expanded_names requires expanded_shapes and expanded_dtypes"
            )
        for name, dtype, shape in zip(expanded_names, expanded_dtypes, expanded_shapes):
            expanded_vars.append(
                (name, np.dtype(dtype), tuple(shape), dims.get(name))
            )
    return PyFuncModel(
        _ndim=ndim,
        _make_logp_fn=make_logp_fn,
        _make_expand_fn=make_expand_fn,
        _make_initial_point_fn=make_initial_point_fn,
        _expanded_vars=tuple(expanded_vars),
        _param_vars=tuple(param_vars) if param_vars else None,
        _coords=dict(coords or {}),
        _dims=dims,
        _shared_data=dict(shared_data or {}),
        _reparameterized_names=tuple(reparameterized_names or ()),
    )


@dataclasses.dataclass(frozen=True)
class CompiledModelDef(CompiledModel):
    """Adapter exposing a raw :class:`ModelDef` as a CompiledModel."""

    model_def: ModelDef = None
    _transform_adapt_args: dict = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        object.__setattr__(self, "coords", dict(self.model_def.coords))
        object.__setattr__(
            self,
            "dims",
            {v.name: tuple(v.dims or ()) for v in self.model_def.expanded_variables},
        )

    @property
    def n_dim(self) -> int:
        return self.model_def.ndim

    def _make_model(self, seed: int) -> ModelDef:
        return self.model_def


def compile_model_def(model_def: ModelDef) -> CompiledModelDef:
    return CompiledModelDef(model_def=model_def)
