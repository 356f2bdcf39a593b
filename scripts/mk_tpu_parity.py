"""Megakernel vs XLA runner on REAL TPU: parity + throughput.

Runs an identical warm fleet through one post-warmup chunk with (a) the
XLA chunk runner and (b) the Mosaic-COMPILED Pallas megakernel (not
interpret mode), then compares draws.  The two are the same machine-step
trace under different op spellings (ops/spellings.py), so floats agree to
f32 rounding until rounding flips a discrete tree decision; the parity
criterion is therefore row-level: the share of (chain, draw) positions
agreeing within tolerance, plus fleet-level moment agreement.  Also times
warm repetitions of both runners on identical state for a direct
throughput A/B.  Writes results/mk_tpu_parity.json.

Env: NUTPIE_MK_TILE (64), NUTPIE_MK_UNROLL (1), NUTPIE_MK_CHAINS (512),
NUTPIE_MK_CHUNK (32).
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
from nutpie_tpu.ops import row_write
from nutpie_tpu.sampler import AdaptConfig, NutsConfig
from nutpie_tpu.sampler.adapt import make_schedule
from nutpie_tpu.sampler.megakernel import make_megakernel_chunk_runner
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

    tile = int(os.environ.get("NUTPIE_MK_TILE", "64"))
    unroll = int(os.environ.get("NUTPIE_MK_UNROLL", "1"))
    chains = int(os.environ.get("NUTPIE_MK_CHAINS", "512"))
    chunk = int(os.environ.get("NUTPIE_MK_CHUNK", "32"))
    tune = 300
    reps = int(os.environ.get("NUTPIE_MK_REPS", "4"))

    model = radon(gather="onehot")
    dtype = jnp.float32
    cfg = NutsConfig(adapt=AdaptConfig(num_tune=tune))
    sched = make_schedule(cfg.adapt, tune)

    init_fn = make_init_fn(model, cfg, dtype)
    states, _ = init_chains(
        model, cfg, 42, chains, np.zeros(model.ndim), dtype, init_fn=init_fn
    )
    warm = make_chunk_runner(model, cfg, chunk, dtype, unroll=8,
                             pool_mass_matrix=True, pool_step_size=True)
    start = 0
    while start < tune:
        states, _b = warm(states, start, min(chunk, tune - start), sched)
        start += chunk
    snap = jax.tree_util.tree_map(jnp.copy, states)
    jax.block_until_ready(snap.vecs)

    def clone(t):
        return jax.tree_util.tree_map(jnp.copy, t)

    # XLA reference chunk (select row writes = megakernel's lowering)
    xla_run = make_chunk_runner(model, cfg, chunk, dtype, unroll=unroll,
                                adapt_frozen=True)
    s_ref, b_ref = xla_run(clone(snap), tune, chunk, sched)
    jax.block_until_ready(b_ref.position)

    mk_run = make_megakernel_chunk_runner(
        model, cfg, chunk, dtype, tile=tile, unroll=unroll
    )
    s_mk, b_mk = mk_run(clone(snap), tune, chunk, sched)
    jax.block_until_ready(b_mk.position)

    pos_ref = np.asarray(b_ref.position)
    pos_mk = np.asarray(b_mk.position)
    close = np.isclose(pos_ref, pos_mk, rtol=1e-4, atol=1e-5)
    row_agree = float(close.all(axis=-1).mean())
    mom_rel = float(
        np.abs(pos_ref.mean((0, 1)) - pos_mk.mean((0, 1))).max()
        / (np.abs(pos_ref.mean((0, 1))).max() + 1e-9)
    )
    n_ref = np.asarray(b_ref.n_steps)
    n_mk = np.asarray(b_mk.n_steps)
    steps_agree = float((n_ref == n_mk).mean())

    # ---- throughput A/B on identical state (donated args -> fresh clones)
    def timed(runner):
        s = clone(snap)
        s, b = runner(s, tune, chunk, sched)  # compile/warm
        jax.block_until_ready(b.position)
        grads = 0.0
        t0 = time.perf_counter()
        for i in range(reps):
            s, b = runner(s, tune + i * chunk, chunk, sched)
            grads += float(jnp.sum(b.n_steps))
        jax.block_until_ready(b.position)
        dt = time.perf_counter() - t0
        return grads / dt, dt

    xla_rate, xla_dt = timed(xla_run)
    mk_rate, mk_dt = timed(mk_run)

    out = {
        "metric": "megakernel_tpu_parity_and_perf",
        "config": {"chains": chains, "chunk": chunk, "tile": tile,
                   "unroll": unroll, "reps": reps},
        "parity": {
            "row_agree_share": round(row_agree, 4),
            "n_steps_agree_share": round(steps_agree, 4),
            "fleet_moment_rel_diff": round(mom_rel, 6),
        },
        "perf": {
            "xla_grads_per_s": round(xla_rate, 1),
            "megakernel_grads_per_s": round(mk_rate, 1),
            "mk_over_xla": round(mk_rate / xla_rate, 3),
        },
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "mk_tpu_parity.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
