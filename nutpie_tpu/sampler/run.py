"""Chunked device-loop driver for the vectorized NUTS machine.

The sampler runs as a sequence of *chunks*: one jitted call produces
``chunk_len`` draws for every chain via a single ``lax.while_loop`` over
leapfrog steps (see ``nuts.py``).  Chunk boundaries are where the host
interacts: storage append, progress callbacks, pause/resume/abort control,
and (optionally) cross-chain pooling of adaptation statistics.  This replaces
the reference's thread-per-chain architecture (nuts-rs ``Sampler::new``
spawning rayon workers, ``src/wrapper.rs:976-1095``) with a pure-JAX design
where the chains axis is sharded over the device mesh.

Determinism: all randomness derives from ``fold_in`` chains of the per-chain
key -- momentum gaussians are keyed by absolute draw index and in-trajectory
scalars by the cumulative leapfrog count, so results are independent of chunk
size and mesh layout.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..model import ModelDef
from .adapt import Schedule, pool_adapt_state
from .nuts import (
    ChunkBuffers,
    NutsConfig,
    init_buffers,
    init_machine_state,
    machine_step,
    start_draw,
)
from .state import NutsMachineState


def resolve_dtype(precision: str) -> jnp.dtype:
    if precision == "float64":
        return jnp.float64
    if precision == "float32":
        return jnp.float32
    # auto: float64 when x64 is enabled (CPU/testing), else float32 (TPU)
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def init_chains(
    model: ModelDef,
    cfg: NutsConfig,
    seed: int,
    n_chains: int,
    init_mean,
    dtype,
    num_try_init: int = 100,
):
    """Initialize all chains; retry until logp and gradient are finite.

    Mirrors the reference's init protocol (seeded jittered init point,
    retried up to ``num_try_init`` times; ``src/pyfunc.rs:535-568``).
    Returns the batched machine state and a per-chain success flag.
    """
    master = jax.random.key(seed)
    chain_keys = jax.vmap(lambda i: jax.random.fold_in(master, i))(
        jnp.arange(n_chains)
    )
    init_mean = jnp.asarray(init_mean, dtype)

    def one_chain(chain_key):
        init_base = jax.random.fold_in(chain_key, 0)

        def try_init(t):
            pos = model.initial_position(
                jax.random.fold_in(init_base, t), init_mean
            ).astype(dtype)
            logp, grad = model.logp_and_grad(pos)
            ok = jnp.isfinite(logp) & jnp.all(jnp.isfinite(grad))
            return pos, logp.astype(dtype), grad.astype(dtype), ok

        def cond(carry):
            t, _, _, _, ok = carry
            return (~ok) & (t < num_try_init)

        def body(carry):
            t = carry[0]
            pos, logp, grad, ok = try_init(t)
            return (t + 1, pos, logp, grad, ok)

        pos0, logp0, grad0, ok0 = try_init(0)
        _, pos, logp, grad, ok = jax.lax.while_loop(
            cond, body, (jnp.ones((), jnp.int32), pos0, logp0, grad0, ok0)
        )
        state = init_machine_state(cfg, chain_key, pos, grad, logp, dtype)
        return state, ok

    return jax.jit(jax.vmap(one_chain))(chain_keys)


def make_chunk_runner(model: ModelDef, cfg: NutsConfig, chunk_len: int, dtype,
                      pool_mass_matrix: bool = False):
    """Build the jitted function running one chunk of draws for all chains."""

    def logp_and_grad(x):
        return jax.value_and_grad(model.logp_fn)(x)

    def run_chunk(states: NutsMachineState, chunk_start, limit, sched: Schedule):
        n_chains = states.done.shape[0]
        dim = states.position.shape[-1]
        chunk_start = jnp.asarray(chunk_start, jnp.int32)
        limit = jnp.asarray(limit, jnp.int32)

        if pool_mass_matrix:
            states = states._replace(adapt=pool_adapt_state(states.adapt))

        if cfg.low_rank is not None:
            # recompute the low-rank factors from the current window at the
            # chunk boundary (all chains sit at a draw boundary here); the
            # expensive QR/eigh runs once per chunk, not per leapfrog
            from .low_rank import estimate_low_rank
            from .state import tree_where as _tw

            lr = cfg.low_rank

            def update_metric(adapt, draw_idx):
                metric_new = estimate_low_rank(
                    adapt.win_draws, adapt.win_grads, adapt.win_count,
                    adapt.inv_mass, lr.max_rank, lr.eigval_cutoff, lr.gamma,
                )
                due = (
                    (draw_idx >= sched.early_end)
                    & (draw_idx < sched.freeze_start)
                    & (adapt.win_count >= jnp.minimum(8, lr.window))
                )
                metric = _tw(due, metric_new, adapt.metric)
                return adapt._replace(metric=metric)

            states = states._replace(
                adapt=jax.vmap(update_metric)(states.adapt, states.draw_idx)
            )

        # per-draw randomness, keyed by absolute draw index
        draw_ids = chunk_start + jnp.arange(chunk_len, dtype=jnp.int32)

        def per_chain_randoms(chain_key):
            mom_base = jax.random.fold_in(chain_key, 1)
            jit_base = jax.random.fold_in(chain_key, 2)
            mom = jax.vmap(
                lambda d: jax.random.normal(
                    jax.random.fold_in(mom_base, d), (dim,), dtype
                )
            )(draw_ids)
            jit_u = jax.vmap(
                lambda d: jax.random.uniform(
                    jax.random.fold_in(jit_base, d), (), dtype
                )
            )(draw_ids)
            return mom, jit_u

        mom_gauss, jitter_us = jax.vmap(per_chain_randoms)(states.rng_key)

        bufs = jax.vmap(lambda _: init_buffers(cfg, chunk_len, dim, dtype))(
            jnp.arange(n_chains)
        )

        # every chain begins the chunk at a draw boundary
        states = states._replace(done=jnp.zeros_like(states.done))
        states = jax.vmap(partial(start_draw, cfg, sched))(
            states, mom_gauss[:, 0], jitter_us[:, 0]
        )

        step = jax.vmap(
            partial(machine_step, cfg, logp_and_grad),
            in_axes=(None, 0, 0, None, None, 0, 0),
        )

        def cond(carry):
            st, _ = carry
            return ~jnp.all(st.done)

        def body(carry):
            st, bf = carry
            return step(sched, mom_gauss, jitter_us, chunk_start, limit, st, bf)

        states, bufs = jax.lax.while_loop(cond, body, (states, bufs))
        return states, bufs

    return jax.jit(run_chunk, donate_argnums=(0,))
