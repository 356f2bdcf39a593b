"""Phase-resolved perf probe: ms/chunk and grads/s for warmup vs posterior.

Localizes per-sweep cost on the radon bench configuration: runs warmup
chunks (adapting runner) and posterior chunks (frozen runner) separately,
timing each phase, and reports sweeps/s and grad-evals/s per phase.  Use to
compare runner variants / commits on identical work.

Env knobs: NUTPIE_PROBE_CHAINS (2048), NUTPIE_PROBE_TUNE (300),
NUTPIE_PROBE_POST_CHUNKS (8), NUTPIE_PROBE_UNROLL (8),
NUTPIE_PROBE_POOL (1), NUTPIE_PROBE_MODE (xla | megakernel).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nutpie_tpu.models import radon
from nutpie_tpu.sampler import AdaptConfig, NutsConfig
from nutpie_tpu.sampler.adapt import make_schedule
from nutpie_tpu.sampler.run import init_chains, make_chunk_runner, make_init_fn



def _enable_compile_cache() -> None:
    """Persistent XLA compile cache: compiles go through a remote helper
    on tunneled TPU topologies (minutes per program); caching them makes
    repeated bench/probe runs start in seconds."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

def main() -> None:
    _enable_compile_cache()
    ctx = jax.default_matmul_precision("highest")
    ctx.__enter__()

    chains = int(os.environ.get("NUTPIE_PROBE_CHAINS", "2048"))
    tune = int(os.environ.get("NUTPIE_PROBE_TUNE", "300"))
    post_chunks = int(os.environ.get("NUTPIE_PROBE_POST_CHUNKS", "8"))
    unroll = int(os.environ.get("NUTPIE_PROBE_UNROLL", "8"))
    pool = os.environ.get("NUTPIE_PROBE_POOL", "1") == "1"
    mode = os.environ.get("NUTPIE_PROBE_MODE", "xla")
    chunk = 32

    gather = os.environ.get(
        "NUTPIE_PROBE_GATHER",
        "onehot" if mode == "megakernel" else "index",
    )
    model = radon(gather=gather)
    dtype = jnp.float32
    cfg = NutsConfig(adapt=AdaptConfig(num_tune=tune))
    sched = make_schedule(cfg.adapt, tune)

    init_fn = make_init_fn(model, cfg, dtype)
    if mode == "megakernel":
        from nutpie_tpu.sampler.megakernel import make_megakernel_chunk_runner

        mk_tile = int(os.environ.get("NUTPIE_MK_TILE", "64"))
        mk_unroll = int(os.environ.get("NUTPIE_MK_UNROLL", "1"))
        # in-kernel warmup adaptation (NUTPIE_MK_WARMUP=0 keeps the XLA
        # adapting runner for the warmup phase)
        if os.environ.get("NUTPIE_MK_WARMUP", "1") == "1":
            runner = make_megakernel_chunk_runner(
                model, cfg, chunk, dtype, tile=mk_tile, unroll=mk_unroll,
                adapt_frozen=False, pool_mass_matrix=pool,
                pool_step_size=pool,
            )
        else:
            runner = make_chunk_runner(
                model, cfg, chunk, dtype, unroll=unroll,
                pool_mass_matrix=pool, pool_step_size=pool,
            )
        frozen = make_megakernel_chunk_runner(
            model, cfg, chunk, dtype, tile=mk_tile, unroll=mk_unroll,
            pool_step_size=pool,
        )
    else:
        runner = make_chunk_runner(
            model, cfg, chunk, dtype, unroll=unroll,
            pool_mass_matrix=pool, pool_step_size=pool,
        )
        frozen = make_chunk_runner(
            model, cfg, chunk, dtype, unroll=unroll, adapt_frozen=True,
            pool_step_size=pool,
        )

    states, _ = init_chains(
        model, cfg, 42, chains, np.zeros(model.ndim), dtype, init_fn=init_fn,
    )

    # ---- warmup phase, timed (compile excluded via a throwaway first call
    # on a separate fleet)
    states_c, _ = init_chains(
        model, cfg, 1, chains, np.zeros(model.ndim), dtype, init_fn=init_fn,
    )
    s, b = runner(states_c, 0, chunk, sched)
    jax.block_until_ready(b.position)

    use_cap = os.environ.get("NUTPIE_PROBE_DEPTH_CAP", "0") == "1"
    from nutpie_tpu.sampler.run import fleet_depth_cap

    @jax.jit
    def _accum(steps, sweeps, n_steps_buf):
        # one dispatch per chunk (eager per-chunk sums cost tunnel RTTs)
        sw = jnp.sum(jnp.max(n_steps_buf, axis=0))
        return steps + jnp.sum(n_steps_buf), sweeps + sw, sw

    t0 = time.perf_counter()
    start = 0
    warm_steps = jnp.zeros((), jnp.float32)
    warm_sweeps = jnp.zeros((), jnp.float32)
    chunk_sweeps = []  # per-chunk fleet sweep counts (device scalars)
    # depth_cap stays a DEVICE scalar; rebuilding the whole Schedule per
    # chunk issues fresh host->device puts each time (tunnel RTTs dominate)
    depth_cap = cfg.initial_depth_cap if (use_cap and chains >= 64) else None
    sched_i = make_schedule(cfg.adapt, tune, depth_cap)
    freeze_start = tune - int(cfg.adapt.freeze_share * tune)
    while start < tune:
        limit = min(chunk, tune - start)
        states, bufs = runner(states, start, limit, sched_i)
        if use_cap and start + limit <= freeze_start:
            sched_i = sched_i._replace(
                depth_cap=fleet_depth_cap(cfg, bufs, limit)
            )
        warm_steps, warm_sweeps, sw = _accum(
            warm_steps, warm_sweeps, bufs.n_steps
        )
        chunk_sweeps.append(sw)
        start += limit
    warm_steps_i = int(warm_steps)  # syncs
    warm_sweeps_i = int(warm_sweeps)
    t_warm = time.perf_counter() - t0
    chunk_sweeps = [int(s) for s in chunk_sweeps]

    # ---- posterior phase, timed (first frozen call = compile, excluded)
    s2 = jax.tree_util.tree_map(jnp.copy, states)
    s2, b2 = frozen(s2, tune, chunk, sched)
    jax.block_until_ready(b2.position)

    states_p = states
    t0 = time.perf_counter()
    post_steps = jnp.zeros((), jnp.float32)
    post_sweeps = jnp.zeros((), jnp.float32)
    for i in range(post_chunks):
        states_p, bufs = frozen(states_p, tune + i * chunk, chunk, sched)
        post_steps, post_sweeps, _sw = _accum(
            post_steps, post_sweeps, bufs.n_steps
        )
    post_steps_i = int(post_steps)
    post_sweeps_i = int(post_sweeps)
    t_post = time.perf_counter() - t0

    print(json.dumps({
        "metric": "perf_probe",
        "mode": mode,
        "chains": chains,
        "unroll": unroll,
        "pool": pool,
        "warmup": {
            "wall_s": round(t_warm, 3),
            "grads": warm_steps_i,
            "grads_per_s": round(warm_steps_i / t_warm, 1),
            "fleet_sweeps": warm_sweeps_i,
            "ms_per_sweep": round(1e3 * t_warm / max(warm_sweeps_i, 1), 4),
            "chunk_sweeps": chunk_sweeps,
            "depth_cap_updates": use_cap,
        },
        "posterior": {
            "wall_s": round(t_post, 3),
            "draws": post_chunks * chunk,
            "grads": post_steps_i,
            "grads_per_s": round(post_steps_i / t_post, 1),
            "fleet_sweeps": post_sweeps_i,
            "ms_per_sweep": round(1e3 * t_post / max(post_sweeps_i, 1), 4),
        },
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
