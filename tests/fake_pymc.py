"""Minimal pymc/pytensor stand-ins driving ``frontends/pymc.py`` in CI.

pymc/pytensor are not installable in this image, so the PyMC frontend's
slicing/jitter/dims/with_data logic would otherwise never execute (VERDICT
r2 #7).  This module implements JUST the API surface
``CompiledPyMCModel._make_model`` touches -- graphs are tiny nodes whose
``compute(env)`` is plain JAX, so ``_jaxify`` lowering, both gradient
backends, and end-to-end sampling all run for real.  Install via
:func:`install` (monkeypatch-friendly); build fixture models with
:func:`linear_regression_model`.

This is a test fixture, not a PyMC reimplementation: anything the frontend
does not call is absent.
"""

from __future__ import annotations

import sys
import types

import numpy as np


class Var:
    """A graph node: inputs have no compute; outputs map env -> value."""

    def __init__(self, name, compute=None):
        self.name = name
        self.compute = compute

    def __repr__(self):
        return f"<Var {self.name}>"


# --------------------------------------------------------------- pytensor


def _make_pytensor_modules():
    import jax

    pytensor = types.ModuleType("pytensor")
    compile_mod = types.ModuleType("pytensor.compile")
    mode_mod = types.ModuleType("pytensor.compile.mode")
    graph_mod = types.ModuleType("pytensor.graph")
    fg_mod = types.ModuleType("pytensor.graph.fg")
    rewr_mod = types.ModuleType("pytensor.graph.rewriting")
    rewr_basic = types.ModuleType("pytensor.graph.rewriting.basic")
    link_mod = types.ModuleType("pytensor.link")
    link_jax = types.ModuleType("pytensor.link.jax")
    dispatch_mod = types.ModuleType("pytensor.link.jax.dispatch")
    tensor_mod = types.ModuleType("pytensor.tensor")

    class FunctionGraph:
        def __init__(self, inputs, outputs, clone=True):
            self.inputs = list(inputs)
            self.outputs = list(outputs)

    class GraphRewriter:
        pass

    class _Mode:
        # a plain callable (not a GraphRewriter), exercising the
        # `rewriter(graph)` branch of _jaxify
        optimizer = staticmethod(lambda graph: None)

    def get_mode(name):
        assert name == "JAX"
        return _Mode()

    def jax_funcify(graph):
        names = [v.name for v in graph.inputs]
        outs = graph.outputs

        def fn(*vals):
            env = dict(zip(names, vals))
            return [o.compute(env) for o in outs]

        return fn

    def grad(cost, wrt):
        names_of = [v.name for v in wrt]

        def make(i):
            def compute(env):
                keys = list(env.keys())
                vals = [env[k] for k in keys]

                def as_fn(*a):
                    return cost.compute(dict(zip(keys, a)))

                return jax.grad(as_fn, argnums=keys.index(names_of[i]))(*vals)

            return Var(names_of[i] + "_grad", compute)

        return [make(i) for i in range(len(wrt))]

    fg_mod.FunctionGraph = FunctionGraph
    rewr_basic.GraphRewriter = GraphRewriter
    mode_mod.get_mode = get_mode
    dispatch_mod.jax_funcify = jax_funcify
    tensor_mod.grad = grad
    pytensor.compile = compile_mod
    compile_mod.mode = mode_mod
    pytensor.graph = graph_mod
    graph_mod.fg = fg_mod
    graph_mod.rewriting = rewr_mod
    rewr_mod.basic = rewr_basic
    pytensor.link = link_mod
    link_mod.jax = link_jax
    link_jax.dispatch = dispatch_mod
    pytensor.tensor = tensor_mod
    return {
        "pytensor": pytensor,
        "pytensor.compile": compile_mod,
        "pytensor.compile.mode": mode_mod,
        "pytensor.graph": graph_mod,
        "pytensor.graph.fg": fg_mod,
        "pytensor.graph.rewriting": rewr_mod,
        "pytensor.graph.rewriting.basic": rewr_basic,
        "pytensor.link": link_mod,
        "pytensor.link.jax": link_jax,
        "pytensor.link.jax.dispatch": dispatch_mod,
        "pytensor.tensor": tensor_mod,
    }


# ------------------------------------------------------------------- pymc


class FakeModel:
    """What CompiledPyMCModel needs from a pm.Model.

    ``spec`` wires everything:
      value_vars: [(value_name, shape)]
      free_rvs: [rv_name] aligned with value_vars
      logp: env -> scalar (jax; includes jacobian terms)
      outputs: [(name, env -> value)] constrained RVs + deterministics
      initial: {value_name: np.ndarray} transformed-space initial point
      data: {name: np.ndarray} pm.Data values (swappable via set_data)
      coords / named_vars_to_dims / override_transforms
    """

    def __init__(self, spec):
        self._spec = spec
        self.coords = dict(spec.get("coords", {}))
        self.named_vars_to_dims = dict(spec.get("dims", {}))
        self._data = {k: np.asarray(v) for k, v in spec.get("data", {}).items()}
        self.value_vars = [Var(n) for n, _ in spec["value_vars"]]
        self.free_RVs = [Var(n) for n in spec["free_rvs"]]
        self._frozen = False

    # the frontend snapshots shapes from here
    def initial_point(self, random_seed=0):
        return {k: np.asarray(v) for k, v in self._spec["initial"].items()}

    def logp(self, jacobian=True, sum=True):
        assert jacobian and sum
        data = self._data

        def compute(env):
            return self._spec["logp"](env, data)

        return Var("__logp__", compute)

    @property
    def unobserved_value_vars(self):
        data = self._data
        outs = []
        for name, fn in self._spec["outputs"]:
            outs.append(Var(name, (lambda f=fn: lambda env: f(env, data))()))
        return outs

    # pm.set_data target
    def _set_data(self, updates):
        for key, value in updates.items():
            if key not in self._data:
                raise KeyError(f"unknown shared variable {key!r}")
            value = np.asarray(value)
            if value.shape != self._data[key].shape:
                raise ValueError(
                    f"shared variable {key!r} has shape "
                    f"{self._data[key].shape}, got {value.shape}"
                )
            self._data[key] = value

    # pm.Model context manager protocol (with model: pm.set_data(...))
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def _make_pymc_modules():
    pm = types.ModuleType("pymc")
    init_mod = types.ModuleType("pymc.initial_point")
    util_mod = types.ModuleType("pymc.util")
    model_mod = types.ModuleType("pymc.model")
    transform_mod = types.ModuleType("pymc.model.transform")
    opt_mod = types.ModuleType("pymc.model.transform.optimization")

    def set_data(updates, model=None):
        model._set_data(updates)

    def freeze_dims_and_data(model):
        model._frozen = True
        return model

    def make_initial_point_fn(model, jitter_rvs, overrides,
                              return_transformed):
        assert return_transformed
        spec = model._spec
        to_transformed = spec.get("override_transforms", {})

        def fn(seed):
            point = {k: np.asarray(v) for k, v in spec["initial"].items()}
            if overrides:
                for rv, value in overrides.items():
                    value_name, tf = to_transformed.get(
                        rv.name, (rv.name, lambda v: v)
                    )
                    point[value_name] = np.asarray(tf(np.asarray(value)))
            return point

        return fn

    def get_default_varnames(var_iterator, include_transformed):
        assert not include_transformed
        return [v for v in var_iterator if not v.name.endswith("__")]

    pm.set_data = set_data
    pm.Model = FakeModel
    init_mod.make_initial_point_fn = make_initial_point_fn
    util_mod.get_default_varnames = get_default_varnames
    pm.initial_point = init_mod
    pm.util = util_mod
    pm.model = model_mod
    model_mod.transform = transform_mod
    transform_mod.optimization = opt_mod
    opt_mod.freeze_dims_and_data = freeze_dims_and_data
    return {
        "pymc": pm,
        "pymc.initial_point": init_mod,
        "pymc.util": util_mod,
        "pymc.model": model_mod,
        "pymc.model.transform": transform_mod,
        "pymc.model.transform.optimization": opt_mod,
    }


def install(monkeypatch):
    """Install the stand-ins into sys.modules (skipped if real pymc exists)."""
    try:
        import pymc  # noqa: F401

        return False  # real pymc present; use it
    except ImportError:
        pass
    for name, mod in {**_make_pytensor_modules(),
                      **_make_pymc_modules()}.items():
        monkeypatch.setitem(sys.modules, name, mod)
    return True


# ------------------------------------------------------------ fixture model


def linear_regression_model(N=40, K=3, seed=0):
    """y ~ N(X beta, sigma); beta[K] (dims coef), sigma log-transformed,
    deterministic mu = X beta (dims obs).  Exercises: multi-var flat
    slicing, a reparameterized (transformed) value var, dims/coords,
    swappable pm.Data, and deterministics."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    X = rng.standard_normal((N, K))
    true_beta = np.array([1.0, -0.5, 0.25])[:K]
    y = X @ true_beta + 0.3 * rng.standard_normal(N)

    def logp(env, data):
        beta = env["beta"]
        s = env["sigma_log__"]
        sigma = jnp.exp(s)
        resid = jnp.asarray(data["y"]) - jnp.asarray(data["X"]) @ beta
        n = data["y"].shape[0]
        ll = (
            -0.5 * jnp.sum(resid**2) / sigma**2
            - n * s - 0.5 * n * jnp.log(2 * jnp.pi)
        )
        lp_beta = -0.5 * jnp.sum(beta**2) / 100.0
        # HalfNormal(1) on sigma + log-jacobian of the exp transform
        lp_sigma = -0.5 * sigma**2 + s
        return ll + lp_beta + lp_sigma

    outputs = [
        ("beta", lambda env, data: env["beta"]),
        ("sigma", lambda env, data: __import__("jax.numpy", fromlist=["exp"]).exp(
            env["sigma_log__"]
        )),
        ("mu", lambda env, data: __import__("jax.numpy", fromlist=["dot"]).dot(
            np.asarray(data["X"]), env["beta"]
        )),
    ]

    spec = dict(
        value_vars=[("beta", (K,)), ("sigma_log__", ())],
        free_rvs=["beta", "sigma"],
        logp=logp,
        outputs=outputs,
        initial={"beta": np.zeros(K), "sigma_log__": np.array(0.0)},
        data={"X": X, "y": y},
        coords={"coef": [f"b{i}" for i in range(K)], "obs": list(range(N))},
        dims={"beta": ("coef",), "mu": ("obs",)},
        override_transforms={
            "beta": ("beta", lambda v: v),
            "sigma": ("sigma_log__", lambda v: np.log(v)),
        },
    )
    return FakeModel(spec), X, y, true_beta
