"""Microcanonical Langevin Monte Carlo (MCLMC) sampler.

Implements the reference's experimental ``sampler="mclmc"`` mode
(settings at ``src/wrapper.rs:662-712``): isokinetic Langevin dynamics with
partial momentum decoherence (Robnik, De Luca, Silverstein & Seljak 2022,
arXiv:2212.08549), preconditioned by the same gradient-based diagonal mass
matrix as NUTS.

Unlike NUTS there is no accept/reject and the trajectory length per draw is
fixed, so the whole chunk is one ``lax.scan`` over draws with an inner
integrator loop -- all chains in lockstep, ideal for the TPU.

Warmup: the step size adapts toward a target energy-error variance per
dimension (EEVPD), and the diagonal preconditioner uses the shared
current/background Welford machinery.  The momentum decoherence length is
``momentum_decoherence_length * sqrt(dim)`` in the preconditioned space.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .adapt import (
    AdaptConfig,
    Schedule,
    _estimate_inv_mass,
    welford_add,
    welford_init,
)
from .low_rank import LowRankMetric, estimate_low_rank, identity_metric
from .state import WelfordState, tree_where
from ..transforms.flow import FlowConfig


@dataclasses.dataclass(frozen=True)
class MclmcConfig:
    step_size: float = 0.5
    momentum_decoherence_length: float = 2.0
    steps_per_draw: int = 1
    dynamic_step_size: bool = True
    max_energy_error: float = 1000.0
    target_eevpd: float = 5e-4
    # "microcanonical" | "euclidean" | "euclidean_then_microcanonical"
    # (reference MclmcTrajectoryKind, wrapper.rs:662-712): euclidean runs
    # unadjusted underdamped Langevin (OU partial refresh of a Gaussian
    # momentum); the _then_ variant switches to isokinetic dynamics halfway
    # through warmup
    trajectory: str = "microcanonical"
    store_gradient: bool = False
    store_mass_matrix: bool = False
    # low-rank preconditioner (reference LowRankMclmcSettings,
    # wrapper.rs:131-136): the dynamics run in the preconditioned space
    # x = A z with A A^T = M^{-1} = D^{1/2}(I + U(L-1)U^T)D^{1/2}, i.e.
    # A = D^{1/2}(I + U(sqrt(L)-1)U^T); factors recompute at chunk
    # boundaries from the chunk's draws like the NUTS low-rank path
    low_rank: Optional["LowRankConfig"] = None
    # flow preconditioner (reference FlowMclmcSettings): the dynamics run
    # in the flow's base space with an identity metric; the flow trains at
    # chunk boundaries with the shared Fisher-loss machinery
    flow: Optional[FlowConfig] = None
    adapt: AdaptConfig = dataclasses.field(
        default_factory=lambda: AdaptConfig(num_tune=300)
    )


class MclmcState(NamedTuple):
    rng_key: jax.Array
    position: jax.Array      # [dim] (flow mode: base-space z)
    gradient: jax.Array
    logp: jax.Array
    velocity: jax.Array      # [dim] unit vector (preconditioned space)
    draw_idx: jax.Array
    log_eps: jax.Array
    inv_mass: jax.Array
    draws_cur: WelfordState
    grads_cur: WelfordState
    draws_bg: WelfordState
    grads_bg: WelfordState
    total_steps: jax.Array
    divergence_count: jax.Array
    # None unless the corresponding preconditioner is active (None is an
    # empty pytree, so the state layout stays static per configuration)
    metric: Optional[LowRankMetric] = None
    floww: Optional["FlowWindow"] = None


class MclmcBuffers(NamedTuple):
    position: jax.Array
    logp: jax.Array
    energy_error: jax.Array
    diverging: jax.Array
    step_size: jax.Array
    n_steps: jax.Array
    gradient: jax.Array | None
    mass_matrix_inv: jax.Array | None


def _apply_A(inv_mass, metric, u):
    """x-space velocity from preconditioned-space u: A u with A A^T = M^{-1}."""
    s = jnp.sqrt(inv_mass)
    if metric is None:
        return s * u
    coeff = (jnp.exp(0.5 * metric.log_eigs) - 1.0) * (u @ metric.basis)
    return s * (u + metric.basis @ coeff)


def _apply_At(inv_mass, metric, g):
    """Pull a model-space gradient into the preconditioned space: A^T g."""
    s = jnp.sqrt(inv_mass)
    w = s * g
    if metric is None:
        return w
    coeff = (jnp.exp(0.5 * metric.log_eigs) - 1.0) * (w @ metric.basis)
    return w + metric.basis @ coeff


def _update_velocity(u, g_z, step, dim):
    """Exact isokinetic velocity update for time ``step`` under gradient g_z.

    u' = (u + e(sinh d + (cosh d - 1) <e,u>)) / (cosh d + <e,u> sinh d)
    with e = -g_z/|g_z|, d = step*|g_z|/(dim-1); the kinetic-energy weight
    change is (dim-1) * log(cosh d + <e,u> sinh d).
    """
    g_norm = jnp.sqrt(jnp.sum(g_z * g_z))
    g_norm = jnp.maximum(g_norm, 1e-30)
    e = -g_z / g_norm
    delta = step * g_norm / (dim - 1)
    ue = jnp.sum(u * e)
    ch = jnp.cosh(delta)
    sh = jnp.sinh(delta)
    denom = ch + ue * sh
    u_new = (u + e * (sh + (ch - 1.0) * ue)) / denom
    u_new = u_new / jnp.sqrt(jnp.sum(u_new * u_new))
    dke = (dim - 1) * jnp.log(denom)
    return u_new, dke


def _partial_refresh(u, key, eps, L, dtype):
    nu = jnp.sqrt(jnp.expm1(2.0 * eps / L))
    z = jax.random.normal(key, u.shape, dtype)
    un = u + nu * z
    return un / jnp.sqrt(jnp.sum(un * un))


def make_mclmc_chunk_runner(model, cfg: MclmcConfig, chunk_len: int, dtype):
    """Build the jitted chunk runner: scan over draws, inner integrator."""

    dim = model.ndim
    L = cfg.momentum_decoherence_length * jnp.sqrt(float(dim))

    if cfg.flow is not None:
        from ..transforms.flow import make_flow_logp

        _flow_logp = make_flow_logp(cfg.flow, model.logp_fn)
    else:
        _flow_logp = None

    def one_draw(state: MclmcState, sched: Schedule, draw_keys):
        if cfg.flow is not None:
            # dynamics run in the flow's base space with identity metric;
            # the flow parameters are frozen within a chunk
            flow_params = state.floww.flow
            logp_and_grad = jax.value_and_grad(
                lambda z: _flow_logp(z, flow_params)
            )
        else:
            logp_and_grad = jax.value_and_grad(model.logp_fn)

        def one_step(carry, key):
            """Position-verlet step + partial refresh, for either dynamics.

            Both trajectory kinds share the skeleton (position half step,
            momentum update from the midpoint gradient, position half step)
            so the variant select is elementwise and costs no extra
            gradients.  Energy change: dKE + dV with V = -logp, so
            dV = logp_old - logp_new.
            """
            x, g, logp, u, eps, use_micro = carry
            inv_mass, metric = state.inv_mass, state.metric
            # preconditioned space z = A^{-1} x; dV/dz = -A^T grad(logp)
            x = x + 0.5 * eps * _apply_A(inv_mass, metric, u)
            _, g_mid = logp_and_grad(x)
            g_z = -_apply_At(inv_mass, metric, g_mid.astype(dtype))
            # isokinetic momentum update
            u_m, dke_m = _update_velocity(u, g_z, eps, dim)
            # euclidean (Langevin) momentum update: full kick
            u_e = u - eps * g_z
            dke_e = 0.5 * (jnp.sum(u_e * u_e) - jnp.sum(u * u))
            u = jnp.where(use_micro, u_m, u_e)
            dke = jnp.where(use_micro, dke_m, dke_e)
            x = x + 0.5 * eps * _apply_A(inv_mass, metric, u)
            logp2, g2 = logp_and_grad(x)
            de = dke + (logp - logp2.astype(dtype))
            # partial refresh: projective for isokinetic, OU for euclidean
            u_rm = _partial_refresh(u, key, eps, L, dtype)
            c = jnp.exp(-eps / L)
            xi = jax.random.normal(key, u.shape, dtype)
            u_re = c * u + jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0)) * xi
            u = jnp.where(use_micro, u_rm, u_re)
            return (
                x, g2.astype(dtype), logp2.astype(dtype), u, eps, use_micro,
            ), de

        eps = jnp.exp(state.log_eps)
        if cfg.trajectory == "euclidean":
            use_micro = jnp.zeros((), bool)
        elif cfg.trajectory == "euclidean_then_microcanonical":
            use_micro = state.draw_idx >= sched.num_tune // 2
        else:
            use_micro = jnp.ones((), bool)
        u0 = state.velocity
        # entering the isokinetic regime requires |u| = 1
        u0 = jnp.where(
            use_micro, u0 / jnp.sqrt(jnp.maximum(jnp.sum(u0 * u0), 1e-30)), u0
        )
        carry = (
            state.position, state.gradient, state.logp, u0, eps, use_micro,
        )
        carry, des = jax.lax.scan(one_step, carry, draw_keys)
        x, g, logp, u, _, _ = carry
        de_total = jnp.sum(des)
        var_e = jnp.mean(jnp.square(des))
        # the euclidean (unadjusted Langevin) dynamics has no multinomial
        # correction, so runaway moves must be rejected aggressively or a
        # chain can drift far out and freeze its step size
        thr = jnp.where(
            use_micro, cfg.max_energy_error,
            jnp.minimum(cfg.max_energy_error, 5.0),
        )
        diverging = (~jnp.isfinite(de_total)) | (jnp.abs(de_total) > thr)
        # reject the draw entirely if it diverged: reset position AND
        # momentum (keeping a blown-up momentum would let the next draw
        # trade its huge kinetic energy for potential with a small *net*
        # energy error, silently teleporting the chain into the tails)
        x = jnp.where(diverging, state.position, x)
        g = jnp.where(diverging, state.gradient, g)
        logp = jnp.where(diverging, state.logp, logp)
        fresh_u = jax.random.normal(draw_keys[-1], u.shape, dtype)
        fresh_u = jnp.where(
            use_micro, fresh_u / jnp.sqrt(jnp.sum(fresh_u * fresh_u)), fresh_u
        )
        u = jnp.where(diverging, fresh_u, u)

        tuning = state.draw_idx < sched.num_tune
        # -- step size adaptation toward target EEVPD
        if cfg.dynamic_step_size:
            eevpd = jnp.maximum(var_e / dim, 1e-20)
            adj = 0.2 * (jnp.log(cfg.target_eevpd) - jnp.log(eevpd))
            # grow cautiously, shrink fast: unadjusted dynamics blow up
            # exponentially past the stability threshold
            adj = jnp.clip(adj, -0.3, jnp.where(use_micro, 0.3, 0.1))
            adj = jnp.where(diverging, -0.5, adj)
            log_eps = jnp.where(tuning, state.log_eps + adj, state.log_eps)
            log_eps = jnp.maximum(log_eps, jnp.log(1e-6))
        else:
            log_eps = state.log_eps
        # -- mass matrix windows (same scheme as NUTS); disabled in flow
        # mode, where the flow absorbs the geometry
        if cfg.adapt.update_mass_matrix:
            ok = tuning & ~diverging
            def upd(w, val):
                return tree_where(ok, welford_add(w, val), w)
            draws_cur = upd(state.draws_cur, x)
            grads_cur = upd(state.grads_cur, g)
            draws_bg = upd(state.draws_bg, x)
            grads_bg = upd(state.grads_bg, g)
            frozen = state.draw_idx >= sched.freeze_start
            freq = jnp.where(
                state.draw_idx < sched.early_end,
                cfg.adapt.early_switch_freq, cfg.adapt.switch_freq,
            )
            switch = tuning & (~frozen) & (state.draw_idx > 0) & (
                (state.draw_idx + 1) % freq == 0
            )
            inv_mass = _estimate_inv_mass(
                cfg.adapt, draws_cur, grads_cur, state.inv_mass
            )
            inv_mass = jnp.where(tuning & ~frozen, inv_mass, state.inv_mass)
            fresh = welford_init(dim, dtype)
            def sw(cur, bg):
                new_cur = tree_where(switch, bg, cur)
                new_bg = tree_where(switch, fresh, bg)
                return new_cur, new_bg
            draws_cur, draws_bg = sw(draws_cur, draws_bg)
            grads_cur, grads_bg = sw(grads_cur, grads_bg)
        else:
            draws_cur, grads_cur = state.draws_cur, state.grads_cur
            draws_bg, grads_bg = state.draws_bg, state.grads_bg
            inv_mass = state.inv_mass

        new_state = state._replace(
            position=x, gradient=g, logp=logp, velocity=u,
            draw_idx=state.draw_idx + 1,
            log_eps=log_eps,
            inv_mass=inv_mass,
            draws_cur=draws_cur, grads_cur=grads_cur,
            draws_bg=draws_bg, grads_bg=grads_bg,
            total_steps=state.total_steps + cfg.steps_per_draw,
            divergence_count=state.divergence_count
            + diverging.astype(jnp.int32),
        )
        # low-rank/flow adaptation consumes the chunk's gradients at chunk
        # boundaries, so the gradient buffer is kept for them too
        need_gradient = (
            cfg.store_gradient or cfg.low_rank is not None
            or cfg.flow is not None
        )
        stats = dict(
            position=x, logp=logp, energy_error=de_total,
            diverging=diverging, step_size=jnp.exp(state.log_eps),
            n_steps=jnp.asarray(cfg.steps_per_draw, jnp.int32),
            gradient=g if need_gradient else None,
            mass_matrix_inv=inv_mass if cfg.store_mass_matrix else None,
        )
        return new_state, stats

    def run_chunk(states: MclmcState, chunk_start, limit, sched: Schedule):
        chunk_start = jnp.asarray(chunk_start, jnp.int32)

        def per_chain(state: MclmcState):
            def scan_draw(st, d):
                draw_id = chunk_start + d
                key_base = jax.random.fold_in(
                    jax.random.fold_in(st.rng_key, 4), draw_id
                )
                draw_keys = jax.random.split(key_base, cfg.steps_per_draw)
                new_st, stats = one_draw(st, sched, draw_keys)
                # draws past `limit` in the final chunk are discarded by the
                # host; mask state advancement to keep determinism exact
                keep = d < limit
                new_st = tree_where(keep, new_st, st)
                return new_st, stats
            return jax.lax.scan(
                scan_draw, state, jnp.arange(chunk_len, dtype=jnp.int32)
            )

        states, stats = jax.vmap(per_chain)(states)
        bufs = MclmcBuffers(
            position=stats["position"],
            logp=stats["logp"],
            energy_error=stats["energy_error"],
            diverging=stats["diverging"],
            step_size=stats["step_size"],
            n_steps=stats["n_steps"],
            gradient=stats["gradient"],
            mass_matrix_inv=stats["mass_matrix_inv"],
        )

        row_ids = jnp.arange(chunk_len, dtype=jnp.int32)

        if cfg.low_rank is not None:
            # recompute the low-rank preconditioner factors from this
            # chunk's draws (chunks are aligned to the switch cadence), as
            # in the NUTS low-rank path (run.py)
            lr = cfg.low_rank

            def update_metric(state_one, pos, grad, divg):
                valid = (row_ids < limit) & (~divg)
                metric_new = estimate_low_rank(
                    pos, grad, valid, state_one.inv_mass,
                    lr.max_rank, lr.eigval_cutoff, lr.gamma,
                )
                end = chunk_start + limit
                due = (
                    (end > sched.early_end)
                    & (end <= sched.freeze_start)
                    & (jnp.sum(valid) >= 8)
                )
                metric = tree_where(due, metric_new, state_one.metric)
                return state_one._replace(metric=metric)

            states = jax.vmap(update_metric)(
                states, bufs.position, bufs.gradient, bufs.diverging
            )

        if cfg.flow is not None:
            from ..transforms.flow import (
                chunk_flow_update,
                chunk_to_model_space,
            )

            fcfg = cfg.flow
            # the chunk's buffers were produced under the current flow;
            # keep it for the model-space conversion below
            flow_of_chunk = states.floww.flow

            def update_flow(state_one, pos, grad, divg):
                rows_ok = (row_ids < limit) & (~divg)
                win, position, gradient, logp = chunk_flow_update(
                    fcfg, model.logp_fn, state_one.floww,
                    state_one.position, state_one.gradient, state_one.logp,
                    pos, grad, rows_ok,
                    in_warmup=chunk_start < sched.num_tune,
                )
                return state_one._replace(
                    floww=win, position=position, gradient=gradient,
                    logp=logp,
                )

            states = jax.vmap(update_flow)(
                states, bufs.position, bufs.gradient, bufs.diverging
            )

            # express the chunk's draws in model space: x = F(z),
            # model logp = logp_z - logdet
            def convert(flow_one, pos, lp, grad):
                xs, logdets, gxs = chunk_to_model_space(
                    fcfg, flow_one, pos, grad
                )
                return xs, lp - logdets, gxs

            xs, logps, gxs = jax.vmap(convert)(
                flow_of_chunk, bufs.position, bufs.logp, bufs.gradient
            )
            bufs = bufs._replace(position=xs, logp=logps, gradient=gxs)
        return states, bufs

    return jax.jit(run_chunk, donate_argnums=(0,))


def init_mclmc_chains(model, cfg: MclmcConfig, seed: int, n_chains: int,
                      init_mean, dtype, num_try_init: int = 100):
    from .adapt import init_inv_mass_from_gradient
    from .run import init_chains as _nuts_init
    from .nuts import NutsConfig

    # reuse the NUTS init search for positions, then build MCLMC state
    nuts_cfg = NutsConfig(adapt=cfg.adapt)
    nuts_states, ok = _nuts_init(
        model, nuts_cfg, seed, n_chains, init_mean, dtype, num_try_init
    )

    def build(chain_key, pos, grad, logp):
        ukey = jax.random.fold_in(chain_key, 5)
        u = jax.random.normal(ukey, pos.shape, dtype)
        u = u / jnp.sqrt(jnp.sum(u * u))
        dim = pos.shape[-1]
        if cfg.flow is not None:
            from ..transforms.flow import init_flow_window

            # identity metric: the flow absorbs the geometry (the initial
            # flow is an exact identity, so base space == model space here)
            inv_mass = jnp.ones((dim,), dtype)
            floww = init_flow_window(cfg.flow, dim, chain_key, dtype)
        else:
            inv_mass = init_inv_mass_from_gradient(grad).astype(dtype)
            floww = None
        metric = None
        if cfg.low_rank is not None:
            metric = identity_metric(dim, cfg.low_rank.max_rank, dtype)
        return MclmcState(
            rng_key=chain_key,
            position=pos, gradient=grad, logp=logp,
            velocity=u,
            draw_idx=jnp.zeros((), jnp.int32),
            log_eps=jnp.asarray(jnp.log(cfg.step_size), dtype),
            inv_mass=inv_mass,
            draws_cur=welford_init(dim, dtype),
            grads_cur=welford_init(dim, dtype),
            draws_bg=welford_init(dim, dtype),
            grads_bg=welford_init(dim, dtype),
            total_steps=jnp.zeros((), jnp.int32),
            divergence_count=jnp.zeros((), jnp.int32),
            metric=metric,
            floww=floww,
        )

    states = jax.jit(jax.vmap(build))(
        nuts_states.rng_key, nuts_states.position, nuts_states.gradient,
        nuts_states.logp,
    )
    return states, ok
