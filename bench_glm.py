"""Many-chain throughput benchmark: logistic GLM (BASELINE.json config #5,
"Large logistic GLM, 10k+ chains sharded across pod slice").

On a single chip this measures the many-chain operating point; on a pod
slice the chains axis shards over the mesh (see nutpie_tpu.parallel).
Prints one JSON line like bench.py.
"""

import json
import os
import time

import numpy as np

# BASELINE config #5 says "10k+ chains"; default to 10240 on the real chip
# (fits v5e HBM at ndim=64).  Override with NUTPIE_GLM_CHAINS for sweeps.
CHAINS = int(os.environ.get("NUTPIE_GLM_CHAINS", "10240"))
TUNE = 300
DRAWS = 700
CHUNK = 32
N_DATA = 2048
DIM = 64


def main() -> None:
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from nutpie_tpu.diagnostics_device import min_ess_over_columns
    from nutpie_tpu.models import logistic_glm
    from nutpie_tpu.sampler import NutsConfig, AdaptConfig
    from nutpie_tpu.sampler.adapt import make_schedule
    from nutpie_tpu.sampler.run import init_chains, make_chunk_runner, make_init_fn

    ctx = jax.default_matmul_precision("highest")
    ctx.__enter__()

    model = logistic_glm(n_data=N_DATA, dim=DIM)
    dtype = jnp.float32
    cfg = NutsConfig(adapt=AdaptConfig(num_tune=TUNE))
    sched = make_schedule(cfg.adapt, TUNE)
    total = TUNE + DRAWS

    init_fn = make_init_fn(model, cfg, dtype)
    runner = make_chunk_runner(model, cfg, CHUNK, dtype, unroll=4)
    if os.environ.get("NUTPIE_TPU_MEGAKERNEL", "") == "1":
        # GLM logp is one matvec -- already Mosaic-lowerable as-is
        from nutpie_tpu.sampler.megakernel import (
            make_megakernel_chunk_runner,
        )

        runner_frozen = make_megakernel_chunk_runner(
            model, cfg, CHUNK, dtype,
            tile=int(os.environ.get("NUTPIE_MK_TILE", "128")),
            unroll=int(os.environ.get("NUTPIE_MK_UNROLL", "1")),
            interpret=os.environ.get("NUTPIE_MK_INTERPRET", "") == "1",
        )
    else:
        runner_frozen = make_chunk_runner(
            model, cfg, CHUNK, dtype, unroll=4, adapt_frozen=True
        )
    cols = jnp.arange(0, DIM, max(1, DIM // 24), dtype=jnp.int32)

    def run(seed):
        states, ok = init_chains(
            model, cfg, seed, CHAINS, np.zeros(model.ndim), dtype,
            init_fn=init_fn,
        )
        post = []
        # device-side accumulation: int() per chunk would block dispatch on
        # every chunk boundary (see bench.py); sync once at the end instead
        n_steps = jnp.zeros((), jnp.float32)
        divergences = jnp.zeros((), jnp.int32)
        start = 0
        while start < total:
            limit = min(CHUNK, total - start)
            active = runner if start < TUNE else runner_frozen
            states, bufs = active(states, start, limit, sched)
            if start + limit > TUNE:
                # keep only the monitored columns on device: the full
                # [10240, 700, 64] posterior plus its concatenate copy
                # exhausts HBM on a single v5e chip (observed r4)
                post.append(
                    bufs.position[:, max(0, TUNE - start):limit, cols]
                )
            n_steps = n_steps + jnp.sum(bufs.n_steps)
            divergences = divergences + jnp.sum(
                bufs.diverging, dtype=jnp.int32
            )
            start += limit
        posterior = jnp.concatenate(post, axis=1)
        min_ess = float(min_ess_over_columns(
            posterior, jnp.arange(cols.shape[0], dtype=jnp.int32)
        ))
        return min_ess, int(n_steps), int(divergences)

    run(1)  # compile
    t0 = time.perf_counter()
    min_ess, n_steps, divergences = run(42)
    elapsed = time.perf_counter() - t0

    print(json.dumps({
        "metric": "glm_manychain_min_ess_per_s",
        "value": round(min_ess / elapsed, 2),
        "unit": "ESS/s",
        "vs_baseline": None,
        "detail": {
            "chains": CHAINS, "tune": TUNE, "draws": DRAWS,
            "n_data": N_DATA, "dim": DIM,
            "min_ess": round(min_ess, 1), "wall_s": round(elapsed, 2),
            "grad_evals_per_s": round(n_steps / elapsed, 1),
            "divergences": divergences,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
