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
scalars by the cumulative leapfrog count, so the RNG streams are independent
of chunk size and mesh layout, and repeated runs with a fixed configuration
are bit-identical.  Changing the device layout or chain count can still
perturb floating-point rounding through XLA's partition-dependent
vectorization, which chaotically perturbs trajectories; posterior statistics
are unaffected.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..model import ModelDef
from .adapt import Schedule, pool_adapt_state
from .nuts import (
    NutsConfig,
    init_buffers,
    init_machine_state,
    machine_step,
    start_draw,
)
from .state import NutsMachineState, state_with


def resolve_dtype(precision: str) -> jnp.dtype:
    if precision == "float64":
        return jnp.float64
    if precision == "float32":
        return jnp.float32
    # auto: float64 when x64 is enabled (CPU/testing), else float32 (TPU)
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def find_initial_step(cfg: NutsConfig, logp_and_grad, state, max_iters: int = 32):
    """Stan-style reasonable-step-size search at the initial position.

    Doubles/halves the step size until the one-leapfrog acceptance
    probability crosses 0.5.  Without this, chains start with a tiny step
    and burn thousands of maxdepth-limited gradient evaluations in the first
    warmup draws.  Runs per chain, fully in-graph.
    """
    from .nuts import _lr_metric, metric_momentum, metric_velocity

    dtype = state.position.dtype
    adapt = state.adapt
    key = jax.random.fold_in(state.rng_key, 6)
    gauss = jax.random.normal(key, state.position.shape, dtype)
    micro = cfg.kinetic == "microcanonical"
    if micro:
        from .mclmc import _apply_A, _apply_At, _update_velocity

        dim = state.position.shape[-1]
        metric_obj = _lr_metric(cfg, adapt)
        p0 = gauss / jnp.maximum(jnp.sqrt(jnp.sum(gauss * gauss)), 1e-30)
        h0 = -state.logp
    else:
        p0 = metric_momentum(cfg, adapt, gauss)
        h0 = -state.logp + 0.5 * jnp.dot(p0, metric_velocity(cfg, adapt, p0))

    def accept_prob(log_eps, n_steps: int = 4):
        # Probe a short trajectory, not a single step: at the (out-of-
        # typical-set) initial position stiffness grows along the path, and
        # a single-step probe under-estimates it enough to diverge the
        # first draws.  Worst energy error over the probe is the criterion.
        eps = jnp.exp(log_eps)

        def leap(carry, _):
            z, p, g, ke, worst = carry
            if micro:
                gt = -_apply_At(adapt.inv_mass, metric_obj, g)
                u_half, dke1 = _update_velocity(p, gt, 0.5 * eps, dim)
                z_new = z + eps * _apply_A(adapt.inv_mass, metric_obj, u_half)
                logp_new, g_new = logp_and_grad(z_new)
                gt_new = -_apply_At(
                    adapt.inv_mass, metric_obj, g_new.astype(dtype)
                )
                p_new, dke2 = _update_velocity(u_half, gt_new, 0.5 * eps, dim)
                ke_new = ke + dke1 + dke2
                h = -logp_new.astype(dtype) + ke_new
            else:
                p_half = p + 0.5 * eps * g
                z_new = z + eps * metric_velocity(cfg, adapt, p_half)
                logp_new, g_new = logp_and_grad(z_new)
                p_new = p_half + 0.5 * eps * g_new.astype(dtype)
                ke_new = ke
                h = -logp_new.astype(dtype) + 0.5 * jnp.dot(
                    p_new, metric_velocity(cfg, adapt, p_new)
                )
            a = h0 - h
            a = jnp.where(jnp.isfinite(a), a, -jnp.inf)
            return (
                z_new, p_new, g_new.astype(dtype), ke_new,
                jnp.minimum(worst, a),
            ), None

        init = (
            state.position, p0, state.gradient, jnp.zeros((), dtype),
            jnp.zeros((), dtype),
        )
        (_, _, _, _, worst), _ = jax.lax.scan(leap, init, None, length=n_steps)
        return worst

    # Cross at target_accept (not Stan's 0.5): the first draws run with this
    # step before dual averaging has data, and a step at the 0.5 boundary is
    # close enough to the stability limit that full trajectories blow up
    # (draw-0/1 divergences on every chain of the radon model).
    log_target = jnp.log(cfg.adapt.target_accept)
    log_eps0 = adapt.da.log_step
    a0 = accept_prob(log_eps0)
    direction = jnp.where(a0 > log_target, 1.0, -1.0).astype(dtype)

    def cond(carry):
        log_eps, i, keep_going = carry
        return keep_going & (i < max_iters)

    def body(carry):
        log_eps, i, _ = carry
        log_eps_new = log_eps + direction * jnp.log(2.0)
        a = accept_prob(log_eps_new)
        # continue while we have not crossed the target boundary
        crossed = jnp.where(direction > 0, a <= log_target, a > log_target)
        # on upward search, stepping past the boundary overshoots: back off
        log_eps_out = jnp.where(
            crossed & (direction > 0), log_eps, log_eps_new
        )
        return (log_eps_out, i + 1, ~crossed)

    log_eps, _, _ = jax.lax.while_loop(
        cond, body, (log_eps0, jnp.zeros((), jnp.int32), a0 > -jnp.inf)
    )
    # Safety margin: the first full trajectories traverse from the init
    # point deep into the typical set, through curvature the local probe
    # cannot see; start a factor 4 below the probed boundary and let dual
    # averaging grow back (clamped at x2 per draw, so ~2 draws).
    log_eps = log_eps - jnp.log(4.0)
    log_eps = jnp.clip(log_eps, jnp.log(1e-10), jnp.log(1e3))
    # No upward mu pull at init (Stan uses log(10)+log_eps): the search just
    # found the stability boundary and the chain is still moving into the
    # typical set where stiffness only grows; any bias up diverges draws
    # 1-2.  The first window switch re-centers mu a factor 2 up.
    da = adapt.da._replace(
        log_step=log_eps,
        log_step_bar=log_eps,
        mu=log_eps,
    )
    return state._replace(adapt=adapt._replace(da=da))


def make_init_fn(
    model: ModelDef,
    cfg: NutsConfig,
    dtype,
    num_try_init: int = 100,
    step_search: bool = True,
):
    """Build the jitted chain-initialization function (cacheable)."""

    def one_chain(chain_key, init_mean):
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
        if step_search:
            state = find_initial_step(
                cfg, model.logp_and_grad, state
            )
        return state, ok

    return jax.jit(jax.vmap(one_chain, in_axes=(0, None)))


def init_chains(
    model: ModelDef,
    cfg: NutsConfig,
    seed: int,
    n_chains: int,
    init_mean,
    dtype,
    num_try_init: int = 100,
    step_search: bool = True,
    init_fn=None,
):
    """Initialize all chains; retry until logp and gradient are finite.

    Mirrors the reference's init protocol (seeded jittered init point,
    retried up to ``num_try_init`` times; ``src/pyfunc.rs:535-568``), plus
    an initial step-size search the reference lacks.
    Returns the batched machine state and a per-chain success flag.
    Pass a cached ``init_fn`` (from :func:`make_init_fn`) to skip re-jitting.
    """
    if init_fn is None:
        init_fn = make_init_fn(model, cfg, dtype, num_try_init, step_search)
    master = jax.random.key(seed)
    chain_keys = jax.vmap(lambda i: jax.random.fold_in(master, i))(
        jnp.arange(n_chains)
    )
    init_mean = jnp.asarray(init_mean, dtype)
    states, ok = init_fn(chain_keys, init_mean)
    if step_search and n_chains >= 8:
        # Init-quality retry: redraw chains that initialized pathologically.
        # Two failure profiles (both stall the lockstep fleet):
        # - stable step size orders of magnitude below the fleet's -- a
        #   pathologically STIFF position (such chains crash below the f32
        #   position resolution during warmup and run futile maxdepth trees);
        # - logp catastrophically below the fleet's -- a far-from-typical-set
        #   position in a locally FLAT region (large allowed step), which
        #   descends the potential running depth-capped trees every draw for
        #   a whole chunk (measured: the 5 worst chunk-1 stragglers on the
        #   radon bench all had init logp -3e5..-9e5 vs fleet median -3.6e3,
        #   with ABOVE-median step sizes).  Same outlier statistic as the
        #   trapped-chain rescue.
        from .state import tree_where

        for round_ in range(2):
            ls = np.asarray(states.adapt.da.log_step)
            bad = ls < np.median(ls) - np.log(100.0)
            lp = np.asarray(states.logp)
            med = np.median(lp)
            mad = np.median(np.abs(lp - med))
            bad |= (med - lp) > 50.0 * (mad + 10.0)
            if not bad.any():
                break
            retry_keys = jax.vmap(
                lambda k: jax.random.fold_in(k, 1000 + round_)
            )(chain_keys)
            states2, ok2 = init_fn(retry_keys, init_mean)
            bad_j = jnp.asarray(bad)
            states = tree_where(bad_j, states2, states)
            ok = jnp.where(bad_j, ok2, ok)
    return states, ok


def fleet_depth_cap(cfg: NutsConfig, bufs, limit) -> jax.Array:
    """Fleet-relative tree-depth cap from one warmup chunk's step counts.

    ``ceil(log2(factor * median steps/draw))`` clipped to ``[4, maxdepth]``
    -- bounds any one chain's per-draw work at ~factor x the fleet median
    (a chain that genuinely needs deeper trees only hits the cap when it is
    an outlier *relative to the fleet*; a uniformly hard geometry raises
    the median and the cap with it).  Device scalar; feed into the next
    chunk's :func:`make_schedule` ``depth_cap``.  Stop updating at the
    mass-matrix freeze point so the posterior kernel is fixed.

    JITTED: called once per warmup chunk from the host loop; the eager
    form dispatched nanmedian op-by-op through the device tunnel and cost
    MORE wall per chunk than the sampling itself (measured r4: warmup wall
    pinned at ~28s across a 2.4x sweep-count change).
    """
    return _fleet_depth_cap_jit(
        float(cfg.depth_cap_factor), int(cfg.maxdepth),
        bufs.scalars, jnp.asarray(limit, jnp.int32),
    )


@partial(jax.jit, static_argnums=(0, 1))
def _fleet_depth_cap_jit(factor: float, maxdepth: int, scalars, limit):
    from .nuts import SCALAR_SLOTS

    ns = scalars[..., SCALAR_SLOTS["n_steps"]]
    row_ok = jnp.arange(ns.shape[-1]) < limit
    ns = jnp.where(row_ok[None, :], ns, jnp.nan)
    med = jnp.nanmedian(ns)
    med = jnp.where(jnp.isfinite(med), med, 2.0 ** 30)
    cap = jnp.ceil(
        jnp.log2(factor * jnp.maximum(med, 1.0))
    ).astype(jnp.int32)
    return jnp.clip(cap, 4, maxdepth)


def rescue_trapped(states: NutsMachineState, chunk_start, limit,
                   sched: Schedule) -> NutsMachineState:
    """Trapped-chain rescue (warmup chunk boundaries only).

    A chain initialized into a pathologically stiff region can reach a
    state where acceptance sits near target at eps ~1e-6 while logp is
    ~1000 sigma worse than the fleet's -- locally self-consistent, globally
    dead: it descends the potential at ~0.3 logp/draw from -265k and every
    draw runs a futile maxdepth tree (1023 gradients) that all lockstep
    chains wait out (<1% such chains stalled the 2048-chain TPU bench 25x).
    Per-chain step-size adaptation cannot detect this -- only the fleet
    can.  During early warmup, teleport trapped chains onto the median-logp
    chain's state (position/gradient/step size/mass matrix); their own RNG
    streams decorrelate them within a few draws, and warmup draws are
    discarded anyway.  The reference has no analog (6 independent CPU
    chains rarely hit the trap; at 2048+ lockstep chains every run does).
    Shared by the XLA runner and the megakernel (which applies it in XLA
    at chunk boundaries -- median/argsort are cross-chain collectives that
    do not belong inside a chain-tiled kernel).
    """
    n_chains = states.logp.shape[0]
    end = chunk_start + limit
    in_window = (end >= 32) & (end * 4 <= sched.num_tune * 3)
    logp = states.logp
    med = jnp.median(logp)
    mad = jnp.median(jnp.abs(logp - med))
    trapped = in_window & ((med - logp) > 50.0 * (mad + 10.0))
    donor = jnp.argsort(logp)[n_chains // 2]

    def teleport(leaf):
        donor_row = leaf[donor]
        mask = trapped.reshape(trapped.shape + (1,) * (leaf.ndim - 1))
        return jnp.where(mask, donor_row[None], leaf)

    return states._replace(
        vecs=teleport(states.vecs),
        flts=teleport(states.flts),
        adapt=jax.tree_util.tree_map(teleport, states.adapt),
    )


def make_chunk_runner(model: ModelDef, cfg: NutsConfig, chunk_len: int, dtype,
                      pool_mass_matrix: bool = False, flow_train: bool = True,
                      unroll: int = 1, adapt_frozen: bool = False,
                      pool_step_size: bool = False):
    """Build the jitted function running one chunk of draws for all chains.

    ``flow_train=False`` compiles a variant without the flow-training stage
    (used for post-warmup chunks, where the flow is frozen).
    ``adapt_frozen=True`` additionally compiles out the per-draw adaptation
    update (post-warmup chunks only; adaptation state is a large share of
    per-step memory traffic).
    ``unroll`` applies the machine step N times per while-loop iteration
    (the step is fully masked, so over-stepping a finished chain is a
    no-op; reduces loop-bookkeeping overhead).
    """
    # decide the row-write lowering (scatter vs select) EAGERLY, outside the
    # trace: on TPU this runs a one-time device correctness probe
    from ..ops.row_write import _use_select

    _use_select()

    if cfg.flow is not None:
        from ..transforms.flow import make_flow_logp

        flow_logp = make_flow_logp(cfg.flow, model.logp_fn)

        def logp_and_grad(z, adapt):
            return jax.value_and_grad(flow_logp)(z, adapt.flow)

    else:

        def logp_and_grad(x, adapt):
            return model.logp_and_grad(x)

    def run_chunk(states: NutsMachineState, chunk_start, limit, sched: Schedule):
        n_chains = states.done.shape[0]
        dim = states.position.shape[-1]
        chunk_start = jnp.asarray(chunk_start, jnp.int32)
        limit = jnp.asarray(limit, jnp.int32)

        if pool_mass_matrix or pool_step_size:
            states = states._replace(adapt=pool_adapt_state(
                states.adapt, pool_mass=pool_mass_matrix,
                pool_step=pool_step_size,
            ))

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

        bufs = init_buffers(cfg, chunk_len, dim, dtype, n_chains=n_chains)

        # every chain begins the chunk at a draw boundary
        states = state_with(states, done=False)
        states = jax.vmap(partial(start_draw, cfg, sched))(
            states, mom_gauss[:, 0], jitter_us[:, 0]
        )

        step = jax.vmap(
            partial(machine_step, cfg, logp_and_grad,
                    adapt_frozen=adapt_frozen),
            in_axes=(None, 0, 0, None, None, 0, 0),
        )

        def cond(carry):
            st, _ = carry
            return ~jnp.all(st.done)

        def body(carry):
            st, bf = carry
            for _ in range(max(1, unroll)):
                st, bf = step(
                    sched, mom_gauss, jitter_us, chunk_start, limit, st, bf
                )
            return st, bf

        states, bufs = jax.lax.while_loop(cond, body, (states, bufs))

        if not adapt_frozen:
            states = rescue_trapped(states, chunk_start, limit, sched)

        row_ids = jnp.arange(chunk_len, dtype=jnp.int32)
        # the chunk's buffers were produced under the *current* flow; keep it
        # for the model-space conversion even after the flow updates below
        adapt_of_chunk = states.adapt

        if cfg.low_rank is not None:
            # recompute the low-rank factors from this chunk's draws (chunks
            # are aligned to the mass-matrix switch cadence); the expensive
            # QR/eigh runs once per chunk, not per leapfrog
            from .low_rank import estimate_low_rank
            from .state import tree_where as _tw

            lr = cfg.low_rank

            def update_metric(state_one, bufs_one):
                adapt = state_one.adapt
                valid = (row_ids < limit) & (~bufs_one.diverging)
                metric_new = estimate_low_rank(
                    bufs_one.position, bufs_one.gradient, valid,
                    adapt.inv_mass, lr.max_rank, lr.eigval_cutoff, lr.gamma,
                )
                end = chunk_start + limit
                due = (
                    (end > sched.early_end)
                    & (end <= sched.freeze_start)
                    & (jnp.sum(valid) >= 8)
                )
                metric = _tw(due, metric_new, adapt.metric)
                return state_one._replace(adapt=adapt._replace(metric=metric))

            states = jax.vmap(update_metric)(states, bufs)

        if cfg.flow is not None and flow_train:
            # roll this chunk's (z, grad_z) draws into the training window,
            # train the per-chain flows (expressed in model space through the
            # current flow), then re-base chains into the new flow's base
            # space.  All vmapped over chains: the whole fleet of flows
            # trains in one XLA program per chunk boundary.
            from ..transforms.flow import FlowWindow, chunk_flow_update

            fcfg = cfg.flow

            def update_flow(state: NutsMachineState, bufs_one):
                adapt = state.adapt
                rows_ok = (row_ids < limit) & (~bufs_one.diverging)
                win = FlowWindow(
                    flow=adapt.flow, flow_updates=adapt.flow_updates,
                    win_draws=adapt.win_draws, win_grads=adapt.win_grads,
                    win_valid=adapt.win_valid,
                )
                buf_pos, buf_grad, rows_v = (
                    bufs_one.position, bufs_one.gradient, rows_ok
                )
                if fcfg.use_orbit:
                    # train_on_orbit: one uniform-leaf orbit sample per draw
                    # doubles the window coverage (see FlowConfig.use_orbit)
                    buf_pos = jnp.concatenate(
                        [buf_pos, bufs_one.orbit_position]
                    )
                    buf_grad = jnp.concatenate(
                        [buf_grad, bufs_one.orbit_gradient]
                    )
                    rows_v = jnp.concatenate([rows_ok, rows_ok])
                win, position, gradient, logp = chunk_flow_update(
                    fcfg, model.logp_fn, win, state.position,
                    state.gradient, state.logp, buf_pos,
                    buf_grad, rows_v,
                    in_warmup=chunk_start < sched.num_tune,
                )
                adapt = adapt._replace(
                    flow=win.flow, flow_updates=win.flow_updates,
                    win_draws=win.win_draws, win_grads=win.win_grads,
                    win_valid=win.win_valid,
                )
                return state_with(
                    state._replace(adapt=adapt),
                    position=position, gradient=gradient, logp=logp,
                )

            states = jax.vmap(update_flow)(states, bufs)

        if cfg.flow is not None:
            # express the chunk's draws in model space: x = F(z), model logp
            # = logp_z - logdet, gradient pushed forward through the flow
            from ..transforms.flow import chunk_to_model_space

            fcfg = cfg.flow

            def convert(bufs_one, adapt_one):
                from .nuts import SCALAR_SLOTS

                xs, logdets, gxs = chunk_to_model_space(
                    fcfg, adapt_one.flow, bufs_one.position,
                    bufs_one.gradient,
                )
                # model-space logp = logp_z - logdet
                scalars = bufs_one.scalars.at[:, SCALAR_SLOTS["logp"]].add(
                    -logdets
                )
                new = bufs_one._replace(position=xs, scalars=scalars)
                if gxs is not None:
                    new = new._replace(gradient=gxs)
                return new

            bufs = jax.vmap(convert)(bufs, adapt_of_chunk)
        return states, bufs

    return jax.jit(run_chunk, donate_argnums=(0,))
