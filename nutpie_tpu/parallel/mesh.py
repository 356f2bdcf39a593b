"""Device mesh utilities: chain-axis sharding over TPU slices.

The parallelism model (SURVEY.md section 2.5): the reference runs one OS
thread per chain on a shared-memory host; the TPU build shards the chains
axis of every state/buffer array over a 1-D device mesh.  All sampler ops
are batched elementwise over chains, so XLA SPMD partitions the whole
program with zero communication; the only cross-chain collectives are the
optional pooled-adaptation reductions at chunk boundaries, which XLA lowers
to ``all-reduce`` over ICI.

Multi-host: call :func:`initialize_distributed` before sampling; chains are
then sharded over the global device set and each host drives its local
shard of the storage.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def chain_mesh(devices=None) -> Mesh:
    """A 1-D mesh with axis ``chains`` over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), axis_names=("chains",))


def shard_chains(tree, mesh: Optional[Mesh] = None):
    """Shard every leaf's leading (chains) axis over the mesh.

    Leaves the tree untouched when only one device exists or the chains axis
    is not divisible by the device count (callers should round the chain
    count to a multiple of the device count for full utilization).
    """
    if mesh is None:
        devices = jax.devices()
        if len(devices) <= 1:
            return tree
        mesh = chain_mesh(devices)
    n_shards = mesh.devices.size
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return tree
    n_chains = leaves[0].shape[0]
    if n_chains % n_shards != 0:
        return tree
    sharding = NamedSharding(mesh, P("chains"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host JAX runtime (idempotent).

    Thin wrapper over ``jax.distributed.initialize`` -- the TPU-native
    replacement for the NCCL/MPI layer the reference never needed
    (SURVEY.md section 5.8).
    """
    # Do NOT probe jax.process_count() here: it initializes the local
    # backend, after which jax.distributed.initialize refuses to run.
    # The distributed client handle is the side-effect-free liveness check.
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized (idempotent)
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
