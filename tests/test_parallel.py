"""Chain-sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

import nutpie_tpu
from nutpie_tpu.frontends.pyfunc import compile_model_def
from nutpie_tpu.models import eight_schools, std_normal
from nutpie_tpu.parallel import chain_mesh, shard_chains


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharding_layout():
    mesh = chain_mesh()
    assert mesh.devices.size == 8
    import jax.numpy as jnp

    tree = {"x": jnp.zeros((16, 3)), "y": jnp.zeros((16,))}
    sharded = shard_chains(tree, mesh)
    shards = sharded["x"].sharding
    assert shards.num_devices == 8
    # non-divisible chain counts stay unsharded rather than erroring
    tree2 = {"x": jnp.zeros((10, 3))}
    out = shard_chains(tree2, mesh)
    assert out["x"].sharding.num_devices in (1, 8)


def test_draws_invariant_to_sharding():
    """The mesh layout must not change the sampled draws: the RNG streams
    are keyed per (seed, chain), and the sampler program is elementwise over
    chains, so an 8-way-sharded run equals a single-device run bit for bit.
    (Changing the *number* of chains may legitimately change rounding via
    different XLA vectorization; layout must not.)"""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nutpie_tpu.models import eight_schools
    from nutpie_tpu.sampler import NutsConfig, AdaptConfig
    from nutpie_tpu.sampler.adapt import make_schedule
    from nutpie_tpu.sampler.run import init_chains, make_chunk_runner

    model = eight_schools()
    cfg = NutsConfig(adapt=AdaptConfig(num_tune=100))
    sched = make_schedule(cfg.adapt, 100)
    dtype = jnp.float64

    def run(shard: bool):
        states, ok = init_chains(model, cfg, 31, 8, np.zeros(model.ndim),
                                 dtype)
        if shard:
            mesh = chain_mesh()
            sharding = NamedSharding(mesh, P("chains"))
            states = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), states
            )
        else:
            dev = jax.devices()[0]
            states = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, dev), states
            )
        runner = make_chunk_runner(model, cfg, 50, dtype)
        out = []
        for k in range(4):
            states, bufs = runner(states, 50 * k, 50, sched)
            out.append(np.asarray(bufs.position))
        return np.concatenate(out, axis=1)

    x_sharded = run(True)
    x_sharded2 = run(True)
    # deterministic for a fixed layout
    np.testing.assert_array_equal(x_sharded, x_sharded2)
    x_single = run(False)
    # across layouts, XLA partitioning changes per-device vectorization and
    # hence fp rounding; trajectories may diverge (chaotically) but the
    # posterior statistics must agree
    post_s = x_sharded[:, 100:]
    post_1 = x_single[:, 100:]
    np.testing.assert_allclose(
        post_s.mean(axis=(0, 1)), post_1.mean(axis=(0, 1)), atol=0.2
    )
    np.testing.assert_allclose(
        post_s.std(axis=(0, 1)), post_1.std(axis=(0, 1)), rtol=0.3
    )
