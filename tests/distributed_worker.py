"""Worker process for the multi-host distributed test.

Usage: python distributed_worker.py <process_id> <num_processes> <port> <outdir>

Each process owns 4 virtual CPU devices; together they form one global
8-device mesh over which the chains axis is sharded (the multi-host
production topology of SURVEY.md section 5.8, exercised on CPU exactly how
the driver validates multi-chip sharding).  Cross-process communication:
the pooled-adaptation all-reduce and the trapped-chain-rescue median inside
the jitted chunk program.
"""

import os
import sys

pid, nproc, port, outdir = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nutpie_tpu.models import std_normal
from nutpie_tpu.parallel.mesh import initialize_distributed
from nutpie_tpu.sampler import AdaptConfig, NutsConfig
from nutpie_tpu.sampler.adapt import make_schedule
from nutpie_tpu.sampler.run import make_chunk_runner, make_init_fn

initialize_distributed(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, len(jax.devices())

N_CHAINS = 16
TUNE, DRAWS, CHUNK = 60, 60, 30

model_def = std_normal(4, mu=1.0, sigma=2.0)
cfg = NutsConfig(adapt=AdaptConfig(num_tune=TUNE))
dtype = jnp.float64
sched = make_schedule(cfg.adapt, TUNE)

mesh = Mesh(np.array(jax.devices()), ("chains",))
sharding = NamedSharding(mesh, P("chains"))

# identical replicated inputs on every process; jit computes each process's
# shard of the globally-sharded outputs
master = jax.random.key(7)
chain_keys = jax.vmap(lambda i: jax.random.fold_in(master, i))(
    jnp.arange(N_CHAINS)
)
init_fn = make_init_fn(model_def, cfg, dtype)
init_sharded = jax.jit(
    lambda keys, mean: init_fn(keys, mean),
    out_shardings=(
        jax.tree_util.tree_map(lambda _: sharding, jax.eval_shape(
            init_fn, chain_keys, jnp.zeros(4, dtype))[0]),
        sharding,
    ),
)
states, ok = init_sharded(chain_keys, jnp.zeros(4, dtype))
assert bool(jnp.all(ok))

runner = make_chunk_runner(
    model_def, cfg, CHUNK, dtype, pool_mass_matrix=True
)
positions = []
start = 0
while start < TUNE + DRAWS:
    limit = min(CHUNK, TUNE + DRAWS - start)
    states, bufs = runner(states, start, limit, sched)
    if start >= TUNE:
        positions.append(bufs.position)
    start += limit

# pooled adaptation must leave every chain (hence every process) with the
# same mass matrix; dump the locally-addressable shard for the parent
inv_mass = states.adapt.inv_mass
local_im = np.concatenate([
    np.asarray(s.data) for s in inv_mass.addressable_shards
])
draws = jnp.concatenate(positions, axis=1)
local_draws = np.concatenate([
    np.asarray(s.data) for s in draws.addressable_shards
])
assert np.isfinite(local_draws).all()
np.savez(
    os.path.join(outdir, f"worker{pid}.npz"),
    inv_mass=local_im,
    mean=local_draws.mean(axis=(0, 1)),
    n_local_chains=local_draws.shape[0],
)
print(f"worker {pid} ok: {local_draws.shape}")
