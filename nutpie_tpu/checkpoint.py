"""Durable checkpoint/resume of sampling runs.

The reference has no durable checkpointing (SURVEY.md section 5.4): its
pause/resume is in-memory only.  On the TPU every piece of sampler state --
positions, adaptation (mass matrix / low-rank factors / flow parameters),
RNG keys, draw counters -- is an explicit JAX pytree, so a checkpoint is a
single ``.npz`` snapshot of the batched machine state.  Combined with
streaming Zarr storage the full run is durable: draws stream to disk as
they complete, and the chain state snapshot allows continuing after a
crash or preemption with ``sample(..., resume_from=path)``.

Determinism: resuming reproduces exactly the draws an uninterrupted run
would have produced (all RNG is keyed by absolute draw/step counters).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np

_FORMAT_VERSION = 1


def save_state(path, states, draws_done: int, meta: dict) -> None:
    """Snapshot a batched machine-state pytree to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(states)
    arrays = {}
    for i, leaf in enumerate(leaves):
        is_key = hasattr(leaf, "dtype") and jax.dtypes.issubdtype(
            leaf.dtype, jax.dtypes.prng_key
        )
        if is_key:  # typed PRNG keys -> raw uint32 key data
            arrays[f"leaf_{i}__prngkey"] = np.asarray(
                jax.random.key_data(leaf)
            )
        else:
            arrays[f"leaf_{i}"] = np.asarray(jax.device_get(leaf))
    manifest = {
        "format_version": _FORMAT_VERSION,
        "draws_done": int(draws_done),
        "n_leaves": len(leaves),
        "state_class": type(states).__name__,
        "meta": meta,
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, __manifest__=json.dumps(manifest), **arrays)
    tmp.replace(path)


def load_state(path, template_states):
    """Restore a snapshot into the structure of ``template_states``.

    The template (a freshly initialized state with identical settings)
    provides the pytree structure and dtypes; shapes must match, which
    guards against resuming with a different model/chain configuration.
    Returns ``(states, draws_done, meta)``.
    """
    with np.load(Path(path), allow_pickle=False) as data:
        manifest = json.loads(str(data["__manifest__"]))
        if manifest["format_version"] != _FORMAT_VERSION:
            raise ValueError(
                f"checkpoint format {manifest['format_version']} not supported"
            )
        leaves_t, treedef = jax.tree_util.tree_flatten(template_states)
        if manifest["n_leaves"] != len(leaves_t):
            raise ValueError(
                "checkpoint does not match the sampler configuration "
                f"({manifest['n_leaves']} leaves vs {len(leaves_t)})"
            )
        leaves = []
        for i, tmpl in enumerate(leaves_t):
            if f"leaf_{i}__prngkey" in data:
                raw = data[f"leaf_{i}__prngkey"]
                leaf = jax.random.wrap_key_data(raw)
            else:
                arr = data[f"leaf_{i}"]
                tmpl_arr = np.asarray(tmpl)
                if arr.shape != tmpl_arr.shape:
                    raise ValueError(
                        f"checkpoint leaf {i} has shape {arr.shape}, "
                        f"expected {tmpl_arr.shape} (different model, chain "
                        f"count, or settings?)"
                    )
                leaf = arr.astype(tmpl_arr.dtype)
            leaves.append(leaf)
        states = jax.tree_util.tree_unflatten(treedef, leaves)
        return states, manifest["draws_done"], manifest["meta"]
