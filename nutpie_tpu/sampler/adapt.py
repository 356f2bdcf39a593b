"""Warmup adaptation: step size + diagonal mass matrix.

Reproduces the reference's adaptation semantics (nuts-rs, observed through
nutpie's settings and docs; see SURVEY.md section 2.2):

- *Step size*: dual averaging toward ``target_accept`` (default 0.8), with an
  Adam and a fixed-step alternative (``wrapper.rs:258-270``).  Soft-restarted
  when the mass matrix switches windows.
- *Mass matrix*: nutpie's signature gradient-based diagonal estimator
  ``sigma_i^2 = sqrt(var(draw_i) / var(grad_i))`` computed from a
  current/background pair of running-variance accumulators that swap every
  ``mass_matrix_switch_freq`` draws (``early_mass_matrix_switch_freq`` during
  the first ``early_phase_share`` of warmup).  Frozen for the final
  ``freeze_share`` of warmup (``docs/sample-stats.qmd:86-89``: "The mass
  matrix will always be fixed for 10% of draws at the end").
- ``use_grad_based_estimate=False`` ("draw_diag") switches to the Stan-style
  draw-variance-only estimator with Stan's shrinkage regularization.

Everything here is pure per-chain JAX; cross-chain pooling happens at chunk
boundaries (see ``sampler/run.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .state import AdamState, DiagAdaptState, DualAvgState, WelfordState


class Schedule(NamedTuple):
    """Dynamic warmup-schedule scalars (not baked into the compiled program,
    so different tune/draw counts reuse the same XLA executable)."""

    num_tune: jax.Array     # i32
    early_end: jax.Array    # i32: end of the early fast-switching phase
    freeze_start: jax.Array # i32: start of the final step-size-only window
    # Fleet-relative tree-depth cap (i32; see run.fleet_depth_cap).  On a
    # lockstep fleet every chain waits out the slowest chain's trajectory,
    # so an outlier running trees ~8x deeper than the fleet median burns 8x
    # everyone's wall clock for one chain's draw quality.  The cap bounds
    # per-draw work at ~8x the fleet median; it is recomputed from each
    # warmup chunk and FROZEN alongside the mass matrix for the posterior
    # phase, so the post-warmup transition kernel stays fixed.  Default
    # 2**30 (> any maxdepth) = truly inert.
    depth_cap: jax.Array    # i32


def make_schedule(cfg: "AdaptConfig", num_tune: int,
                  depth_cap=None) -> Schedule:
    return Schedule(
        num_tune=jnp.asarray(num_tune, jnp.int32),
        early_end=jnp.asarray(int(cfg.early_phase_share * num_tune), jnp.int32),
        freeze_start=jnp.asarray(
            num_tune - int(cfg.freeze_share * num_tune), jnp.int32
        ),
        depth_cap=jnp.asarray(
            2 ** 30 if depth_cap is None else depth_cap, jnp.int32
        ),
    )


@dataclasses.dataclass(frozen=True)
class AdaptConfig:
    """Static adaptation configuration, derived from settings.

    ``num_tune`` is kept for convenience but the in-graph schedule comparisons
    use the dynamic :class:`Schedule` scalars, so changing tune/draw counts
    does not trigger recompilation.
    """

    num_tune: int
    target_accept: float = 0.8
    initial_step: float = 0.1
    # dual averaging
    gamma: float = 0.05
    t0: float = 10.0
    kappa: float = 0.75
    max_step_size: float = 100.0
    # step size method: "dual_average" | "adam" | float (fixed)
    method: object = "dual_average"
    adam_lr: float = 0.05
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    step_size_jitter: Optional[float] = None
    # mass matrix windows
    switch_freq: int = 80
    early_switch_freq: int = 10
    early_phase_share: float = 0.3
    freeze_share: float = 0.1
    use_grad_based_estimate: bool = True
    # disabled in flow mode: the flow absorbs the geometry, NUTS runs with
    # an identity metric in base space
    update_mass_matrix: bool = True
    # clipping for the variance estimate
    min_variance: float = 1e-12
    max_variance: float = 1e12



# ---------------------------------------------------------------- Welford

def welford_init(dim: int, dtype) -> WelfordState:
    return WelfordState(
        mean=jnp.zeros(dim, dtype),
        m2=jnp.zeros(dim, dtype),
        count=jnp.zeros((), dtype),
    )

def welford_add(state: WelfordState, x: jax.Array) -> WelfordState:
    count = state.count + 1
    delta = x - state.mean
    mean = state.mean + delta / count
    m2 = state.m2 + delta * (x - mean)
    return WelfordState(mean, m2, count)

def welford_variance(state: WelfordState) -> jax.Array:
    return state.m2 / jnp.maximum(state.count - 1, 1)


# ---------------------------------------------------------------- step size

def dual_avg_init(cfg: AdaptConfig, dtype) -> DualAvgState:
    log_step = jnp.asarray(jnp.log(cfg.initial_step), dtype)
    return DualAvgState(
        log_step=log_step,
        log_step_bar=log_step,
        hbar=jnp.zeros((), dtype),
        mu=jnp.log(10.0) + log_step,
        count=jnp.zeros((), dtype),
    )

def dual_avg_update(cfg: AdaptConfig, da: DualAvgState, accept: jax.Array) -> DualAvgState:
    count = da.count + 1
    w = 1.0 / (count + cfg.t0)
    hbar = (1.0 - w) * da.hbar + w * (cfg.target_accept - accept)
    log_step = da.mu - jnp.sqrt(count) / cfg.gamma * hbar
    # Trust region with an escape hatch.  Normal operation caps the
    # per-draw *increase* at x2: right after a (re)start the first update
    # jumps most of the way to mu, which uncapped spikes the step and
    # destabilizes warmup (measurably degrades flow-adaptation quality and
    # caused the round-1 radon divergence storms).  But a chain whose step
    # CRASHED far below its running average must rebound in O(1) draws: on
    # TPU every draw it crawls at tiny eps runs a full maxdepth tree (1023
    # gradient evaluations) that all lockstep chains wait out -- <1% such
    # stragglers stalled the 2048-chain bench 25x, and their tiny steps
    # froze into step_size_bar for the whole posterior phase.  The rebound
    # target mu - sqrt(count)/gamma*hbar stays below mu whenever recent
    # acceptance was poor, so the free rebound cannot overshoot the spike
    # regime the cap exists to prevent.  Decreases stay unclamped:
    # shrinking out of a divergence is urgent.
    crashed = da.log_step < da.log_step_bar - jnp.log(8.0)
    cap = jnp.where(crashed, jnp.inf, da.log_step + jnp.log(2.0))
    log_step = jnp.minimum(log_step, cap)
    log_step = jnp.minimum(log_step, jnp.log(cfg.max_step_size))
    eta = count ** (-cfg.kappa)
    log_step_bar = eta * log_step + (1.0 - eta) * da.log_step_bar
    return DualAvgState(log_step, log_step_bar, hbar, da.mu, count)

def dual_avg_restart(da: DualAvgState, shift=0.0) -> DualAvgState:
    """Soft restart after a mass-matrix switch.

    ``shift`` (<= 0) is a stability correction applied to the current step
    when the metric jumped: leapfrog frequencies scale with sqrt(inv_mass),
    so a coordinate whose inv_mass grew by r needs eps shrunk by sqrt(r).
    mu re-centers a factor 2 (not Stan's 10) above the running step: the
    step is already adapted, only gentle upward exploration is wanted.
    """
    log_step = da.log_step + shift
    return DualAvgState(
        log_step=log_step,
        log_step_bar=da.log_step_bar,
        hbar=jnp.zeros_like(da.hbar),
        mu=jnp.log(2.0) + log_step,
        count=jnp.zeros_like(da.count),
    )

def adam_init(dtype) -> AdamState:
    z = jnp.zeros((), dtype)
    return AdamState(m=z, v=z, count=z)

def adam_update(cfg: AdaptConfig, adam: AdamState, da: DualAvgState, accept: jax.Array):
    """Adam on log step size with gradient (accept - target)."""
    g = cfg.target_accept - accept
    count = adam.count + 1
    m = cfg.adam_beta1 * adam.m + (1 - cfg.adam_beta1) * g
    v = cfg.adam_beta2 * adam.v + (1 - cfg.adam_beta2) * g * g
    mhat = m / (1 - cfg.adam_beta1 ** count)
    vhat = v / (1 - cfg.adam_beta2 ** count)
    log_step = da.log_step - cfg.adam_lr * mhat / (jnp.sqrt(vhat) + 1e-8)
    log_step = jnp.minimum(log_step, da.log_step + jnp.log(2.0))
    log_step = jnp.minimum(log_step, jnp.log(cfg.max_step_size))
    eta = count ** (-cfg.kappa)
    log_step_bar = eta * log_step + (1.0 - eta) * da.log_step_bar
    return AdamState(m, v, count), DualAvgState(
        log_step, log_step_bar, da.hbar, da.mu, da.count + 1
    )


# ---------------------------------------------------------------- mass matrix

def init_inv_mass_from_gradient(gradient: jax.Array) -> jax.Array:
    """Gradient-informed initial diagonal: sigma_i^2 ~ 1 / g_i^2.

    For a Gaussian the typical gradient magnitude is 1/sigma, so 1/g^2 is a
    scale-correct first guess before any draws exist (this gradient-informed
    start is part of why the reference needs ~1/3 of Stan's warmup
    gradients).  Clipped for safety; zero gradients fall back to 1.
    """
    g2 = jnp.square(gradient)
    var = jnp.where(g2 > 0, 1.0 / jnp.maximum(g2, 1e-12), 1.0)
    return jnp.clip(var, 1e-6, 1e6)


def diag_adapt_init(cfg: AdaptConfig, gradient: jax.Array, dtype) -> DiagAdaptState:
    dim = gradient.shape[-1]
    return DiagAdaptState(
        da=dual_avg_init(cfg, dtype),
        adam=adam_init(dtype),
        inv_mass=init_inv_mass_from_gradient(gradient).astype(dtype),
        draws_cur=welford_init(dim, dtype),
        grads_cur=welford_init(dim, dtype),
        draws_bg=welford_init(dim, dtype),
        grads_bg=welford_init(dim, dtype),
    )


def _estimate_inv_mass(cfg: AdaptConfig, draws: WelfordState, grads: WelfordState,
                       fallback: jax.Array) -> jax.Array:
    draw_var = welford_variance(draws)
    if cfg.use_grad_based_estimate:
        grad_var = welford_variance(grads)
        est = jnp.sqrt(
            jnp.maximum(draw_var, cfg.min_variance)
            / jnp.maximum(grad_var, cfg.min_variance)
        )
    else:
        # Stan-style shrinkage toward unit scale
        n = draws.count
        est = (n / (n + 5.0)) * draw_var + 1e-3 * (5.0 / (n + 5.0))
    est = jnp.clip(est, cfg.min_variance, cfg.max_variance)
    ok = (draws.count > 2) & jnp.all(jnp.isfinite(est))
    return jnp.where(ok, est, fallback)


def diag_adapt_update(
    cfg: AdaptConfig,
    sched: Schedule,
    adapt: DiagAdaptState,
    draw_idx: jax.Array,
    position: jax.Array,
    gradient: jax.Array,
    accept: jax.Array,
    diverging: jax.Array,
) -> DiagAdaptState:
    """Per-draw adaptation update (masked by caller to tuning draws only)."""
    # -- step size
    if isinstance(cfg.method, (int, float)):
        log_fixed = jnp.asarray(jnp.log(float(cfg.method)), adapt.da.log_step.dtype)
        da = adapt.da._replace(log_step=log_fixed, log_step_bar=log_fixed)
        adam = adapt.adam
    elif cfg.method == "adam":
        adam, da = adam_update(cfg, adapt.adam, adapt.da, accept)
    else:
        da = dual_avg_update(cfg, adapt.da, accept)
        adam = adapt.adam

    # -- mass matrix accumulators (skip divergent draws)
    def add_all():
        return (
            welford_add(adapt.draws_cur, position),
            welford_add(adapt.grads_cur, gradient),
            welford_add(adapt.draws_bg, position),
            welford_add(adapt.grads_bg, gradient),
        )
    def keep_all():
        return (adapt.draws_cur, adapt.grads_cur, adapt.draws_bg, adapt.grads_bg)
    ok = ~diverging & jnp.all(jnp.isfinite(position)) & jnp.all(jnp.isfinite(gradient))
    draws_cur, grads_cur, draws_bg, grads_bg = jax.tree_util.tree_map(
        lambda a, b: jnp.where(ok, a, b), add_all(), keep_all()
    )

    # -- window schedule
    frozen = draw_idx >= sched.freeze_start
    freq = jnp.where(
        draw_idx < sched.early_end, cfg.early_switch_freq, cfg.switch_freq
    )
    switch = (~frozen) & (draw_idx > 0) & ((draw_idx + 1) % freq == 0)

    # switch FIRST (current <- background, background <- fresh), so the new
    # window's estimate, the step-size stability correction, and the
    # dual-averaging restart all land on the same draw.  (Round 1 estimated
    # from the stale window here, so the metric actually jumped one draw
    # after the restart, with a fully re-centered mu -- a reliable
    # divergence per chain per switch.)
    dim = position.shape[-1]
    dtype = position.dtype
    fresh = welford_init(dim, dtype)
    def do_switch(cur, bg):
        return jax.tree_util.tree_map(
            lambda c, b, f: jnp.where(switch, b, c), cur, bg, fresh
        ), jax.tree_util.tree_map(
            lambda b, f: jnp.where(switch, f, b), bg, fresh
        )
    draws_cur, draws_bg = do_switch(draws_cur, draws_bg)
    grads_cur, grads_bg = do_switch(grads_cur, grads_bg)

    # recompute the estimate every (unfrozen) draw from the current window,
    # rate-limited to a factor 2 per coordinate per draw.  Leapfrog
    # stability in coordinate i scales as eps*sqrt(inv_mass_i), so an
    # unbounded metric jump (window switch, volatile early windows) blows
    # up the next trajectory before dual averaging can react -- that was
    # one divergence per chain per switch in round 1.  The tube converges
    # geometrically, so even x1000 corrections complete within ~10 draws,
    # while the per-draw stability-margin loss stays within what dual
    # averaging absorbs.
    if cfg.update_mass_matrix:
        inv_mass = _estimate_inv_mass(cfg, draws_cur, grads_cur, adapt.inv_mass)
        inv_mass = jnp.clip(
            inv_mass, adapt.inv_mass * 0.5, adapt.inv_mass * 2.0
        )
        inv_mass = jnp.where(frozen, adapt.inv_mass, inv_mass)
    else:
        inv_mass = adapt.inv_mass

    # matched step-size correction: eps*sqrt(inv_mass_i) is the stability
    # margin, so when the (tube-limited) metric moves up, shift the step
    # down by exactly the margin lost -- at most 0.5*log(2) per draw, which
    # dual averaging re-earns within a draw when it was not needed
    ratio = jnp.max(inv_mass / jnp.maximum(adapt.inv_mass, cfg.min_variance))
    shift = -0.5 * jnp.log(jnp.clip(ratio, 1.0, 2.0))
    da = da._replace(log_step=da.log_step + shift, mu=da.mu + shift)

    # soft-restart dual averaging when the window switched
    da = jax.tree_util.tree_map(
        lambda r, k: jnp.where(switch, r, k), dual_avg_restart(da), da
    )

    # _replace keeps extra fields (e.g. the low-rank window state) intact
    return adapt._replace(
        da=da, adam=adam, inv_mass=inv_mass,
        draws_cur=draws_cur, grads_cur=grads_cur,
        draws_bg=draws_bg, grads_bg=grads_bg,
    )


def pool_adapt_state(adapt: DiagAdaptState, axis_name: Optional[str] = None,
                     pool_mass: bool = True, pool_step: bool = False):
    """Pool adaptation state across chains (chunk-boundary collective).

    ``pool_mass`` averages the Welford accumulators over the chains axis so
    every chain adapts with the pooled posterior geometry -- an improvement
    over the reference, whose chains never exchange adaptation state
    (SURVEY.md section 2.5).  ``pool_step`` geometric-means the
    dual-averaging step sizes: on a lockstep fleet the wall clock per chunk
    is the MAX over chains of leapfrog steps, so per-chain step-size spread
    directly inflates everyone's wall time (a chain at 2x smaller eps runs
    2x more steps per draw that all chains wait out -- measured 2.2x sweep
    inflation on the radon bench); all chains target the same posterior, so
    a shared step size costs little acceptance while collapsing the tail.
    Called on the batched state (leading chains axis) at chunk boundaries,
    where all chains sit at the same draw index.
    """
    def pool_welford(w: WelfordState) -> WelfordState:
        # combine: total count, pooled mean, pooled within+between m2
        if axis_name is None:
            total = jnp.sum(w.count)
            mean = jnp.sum(w.mean * w.count[..., None], axis=0) / jnp.maximum(total, 1)
            m2 = jnp.sum(
                w.m2 + w.count[..., None] * jnp.square(w.mean - mean), axis=0
            )
            n_chains = w.count.shape[0]
            return WelfordState(
                mean=jnp.broadcast_to(mean, w.mean.shape),
                m2=jnp.broadcast_to(m2 / n_chains, w.m2.shape),
                count=jnp.broadcast_to(total / n_chains, w.count.shape),
            )
        raise NotImplementedError("psum pooling is applied outside shard_map")
    if pool_mass:
        adapt = adapt._replace(
            draws_cur=pool_welford(adapt.draws_cur),
            grads_cur=pool_welford(adapt.grads_cur),
            draws_bg=pool_welford(adapt.draws_bg),
            grads_bg=pool_welford(adapt.grads_bg),
        )
    if pool_step:
        da = adapt.da
        def cmean(x):
            return jnp.broadcast_to(jnp.mean(x, axis=0), x.shape)
        adapt = adapt._replace(da=da._replace(
            log_step=cmean(da.log_step),
            log_step_bar=cmean(da.log_step_bar),
            hbar=cmean(da.hbar),
            mu=cmean(da.mu),
        ))
    return adapt
