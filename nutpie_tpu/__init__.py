"""nutpie_tpu: a TPU-native Bayesian sampling framework.

A from-scratch JAX/XLA implementation of the capabilities of nutpie
(pymc-devs/nutpie): a No-U-Turn sampler consuming PyMC, Stan, and arbitrary
JAX/Python log-densities, with nutpie's gradient-based mass-matrix
adaptation, rich per-draw statistics, async sampling control, and
ArviZ-compatible traces -- redesigned for TPUs: the whole sampler is one
compiled XLA program running thousands of chains sharded over a device mesh.

Public API mirrors the reference (``python/nutpie/__init__.py:10-18``).
"""

__version__ = "0.1.0"

from .model import CompiledModel
from .progress import ChainProgress
from .sample import sample
from .settings import MclmcSettings, NutsSettings


def compile_pymc_model(model, **kwargs):
    """Compile a PyMC model (requires pymc+pytensor installed)."""
    from .frontends.pymc import compile_pymc_model as _impl

    return _impl(model, **kwargs)


def compile_stan_model(*args, **kwargs):
    """Compile a Stan model via the built-in Stan->JAX compiler."""
    from .frontends.stan import compile_stan_model as _impl

    return _impl(*args, **kwargs)


def from_pyfunc(*args, **kwargs):
    """Build a compiled model from JAX-traceable Python functions."""
    from .frontends.pyfunc import from_pyfunc as _impl

    return _impl(*args, **kwargs)


def prune_stan_cache() -> None:
    """No-op for API compatibility (no on-disk Stan artifact cache here)."""
    from .frontends.stan import prune_stan_cache as _impl

    _impl()


__all__ = [
    "__version__",
    "sample",
    "compile_pymc_model",
    "compile_stan_model",
    "prune_stan_cache",
    "from_pyfunc",
    "CompiledModel",
    "ChainProgress",
    "NutsSettings",
    "MclmcSettings",
    "zarr_store",
]

from . import zarr_store  # noqa: E402  (public submodule, reference parity)
