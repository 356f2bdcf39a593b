"""Vectorized No-U-Turn sampler as a flattened per-leapfrog state machine.

Algorithm: multinomial NUTS with biased progressive sampling and the
generalized (momentum-sum) U-turn criterion, matching the reference sampler's
semantics (nuts-rs; multinomial tree doubling to ``maxdepth``, divergence when
the energy error exceeds ``max_energy_error``, dual-averaging step size,
see SURVEY.md section 2.2 and reference ``docs/sampling-options.qmd``).

TPU-native design: instead of one thread per chain with nested tree
recursion, every chain advances by exactly one leapfrog step per machine
iteration.  Doubling bookkeeping, subtree U-turn checks (iterative
checkpointing scheme a la Phan & Pradhan), trajectory merges, draw
completion, and warmup adaptation all happen inline as masked vector ops.
A single ``lax.while_loop`` drives *all* chains through a chunk of draws with
no per-draw barrier: a chain that finishes its draw immediately refreshes its
momentum and continues, so every gradient evaluation slot does useful work
(cf. "Efficiently Vectorized MCMC on Modern Accelerators", arXiv:2503.17405).

The dominant per-step cost is the fused logp+gradient evaluation, which XLA
batches over all chains on the MXU/VPU; the bookkeeping is O(dim) vector ops.
Per-chain state is packed into three arrays (``vecs [NV, dim]``, ``flts``,
``ints``; see ``state.py``): the machine step unpacks to locals, computes
exactly the same expressions as a field-per-array layout would, and
reassembles with three stacks, so the while loop carries ~7 buffers instead
of ~45 (each carried buffer costs an HBM round trip per step on TPU).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .adapt import (
    AdaptConfig,
    Schedule,
    diag_adapt_init,
    diag_adapt_update,
)
from .low_rank import (
    LowRankMetric,
    identity_metric,
    lr_sample_momentum,
    lr_velocity,
    lr_velocity_rows,
)
from .state import (
    DIV_SLOTS,
    FLT_SLOTS,
    INT_SLOTS,
    N_FLT,
    N_INT,
    N_VEC_BASE,
    N_VEC_DIV,
    VEC_SLOTS,
    NutsMachineState,
    tree_where,
)
from ..ops.row_write import masked_row_write, row_read
from ..ops.spellings import mosaic
from ..transforms.flow import FlowConfig, FlowParams, init_flow_params


@dataclasses.dataclass(frozen=True)
class LowRankConfig:
    """Low-rank mass-matrix options (reference ``wrapper.rs:307-334``)."""

    eigval_cutoff: float = 100.0
    gamma: float = 1e-5
    max_rank: int = 32
    # window buffer length; the metric recomputes at chunk boundaries from
    # the draws collected since the last switch
    window: int = 80


class LowRankAdaptState(NamedTuple):
    """Diag adaptation state + low-rank factors.

    Field names overlap :class:`DiagAdaptState` so the shared update code
    works on both via ``_replace``.  The low-rank factors recompute at
    chunk boundaries directly from the chunk's draw/gradient buffers
    (chunks are aligned to the mass-matrix switch cadence), so no per-step
    window bookkeeping exists in the hot loop.
    """

    da: object
    adam: object
    inv_mass: jax.Array
    draws_cur: object
    grads_cur: object
    draws_bg: object
    grads_bg: object
    metric: LowRankMetric


class FlowAdaptState(NamedTuple):
    """Adaptation state for normalizing-flow reparameterization.

    NUTS runs in the flow's base space with an identity mass matrix
    (``inv_mass`` stays at ones; the flow absorbs all geometry).  The
    training window of (z, grad_z) pairs is maintained by *bulk rolls at
    chunk boundaries* from the chunk's draw buffers -- per-step window
    writes would cost O(window*dim) per leapfrog on TPU.
    """

    da: object
    adam: object
    inv_mass: jax.Array    # ones; kept for the shared metric code paths
    draws_cur: object
    grads_cur: object
    draws_bg: object
    grads_bg: object
    win_draws: jax.Array   # [window, dim] base-space positions (newest last)
    win_grads: jax.Array   # [window, dim] base-space gradients
    win_valid: jax.Array   # [window] bool
    flow: FlowParams
    flow_updates: jax.Array  # i32: number of flow updates performed


@dataclasses.dataclass(frozen=True)
class NutsConfig:
    """Static kernel configuration (baked into the compiled program)."""

    maxdepth: int = 10
    mindepth: int = 0
    check_turning: bool = True
    # Kinetic energy of the Hamiltonian (reference NUTS `trajectory_kind`,
    # ``KineticEnergyKind::{Microcanonical, ExactNormal}``,
    # wrapper.rs:590-608).  "exact_normal": standard Gaussian kinetic energy
    # 0.5 p^T M^{-1} p.  "microcanonical": isokinetic (MAMS-style, Robnik &
    # Seljak 2024) dynamics -- the momentum is a unit velocity in the
    # whitened space, the position update moves along A u with A A^T =
    # M^{-1}, and the "energy" of a leaf is -logp plus the kinetic-energy
    # weight accumulated along the integration path (tracked per trajectory
    # edge in the ke_minus/ke_plus state slots), which is exactly the MAMS
    # Metropolis energy error when differenced against h0 = -logp0.
    kinetic: str = "exact_normal"
    # Target trajectory integration time (reference `target_integration_time`,
    # wrapper.rs:577-579; nuts-rs semantics are not vendored, so this build
    # defines it as: each draw's doubling limit is the depth at which the
    # trajectory's integration time 2^depth * eps first reaches the target,
    # plus `extra_doublings`, clipped to [mindepth, maxdepth].  With
    # check_turning=False this yields fixed-integration-time multinomial HMC.
    target_time: Optional[float] = None
    extra_doublings: int = 0
    # Fleet-relative work bound: cap per-draw trees at ~this multiple of
    # the fleet-median steps/draw (see run.fleet_depth_cap); lockstep
    # chains all wait out the slowest chain's trajectory, so the tail IS
    # the wall clock.  Swept on the radon bench at 2048 chains: factors
    # {1, 1.5, 2, 3, 4, 8, 16} -> best ESS/s at 1.5-2.0 with aggregate
    # min-ESS unchanged (truncated outlier trees cost less ESS than the
    # fleet time they burn).  Only engaged at >= 64 chains.
    depth_cap_factor: float = 2.0
    # Depth cap for warmup chunks BEFORE the first fleet measurement
    # exists (same >= 64-chain engagement as the fleet cap).  Measured on
    # the radon bench: the first 32-draw chunk burned 32736 fleet sweeps
    # -- exactly 1023 x 32, one straggler chain running full maxdepth-10
    # trees every draw -- which is ~78% of ALL warmup sweeps; the fleet
    # cap then converges to ~7.  8 allows 255-step trees (~4x the fleet
    # median observed right after), affects only discarded early-warmup
    # draws, and cuts the straggler's tax 4x.
    initial_depth_cap: int = 8
    max_energy_error: float = 1000.0
    store_gradient: bool = False
    store_mass_matrix: bool = False
    store_divergences: bool = False
    store_transformed: bool = False
    low_rank: Optional[LowRankConfig] = None
    flow: Optional[FlowConfig] = None
    adapt: AdaptConfig = dataclasses.field(
        default_factory=lambda: AdaptConfig(num_tune=300)
    )


def metric_velocity(cfg: NutsConfig, adapt, p: jax.Array) -> jax.Array:
    """v = M^{-1} p for the active metric."""
    if cfg.low_rank is not None:
        return lr_velocity(adapt.inv_mass, adapt.metric, p)
    return adapt.inv_mass * p


def metric_velocity_rows(cfg: NutsConfig, adapt, P: jax.Array) -> jax.Array:
    if cfg.low_rank is not None:
        return lr_velocity_rows(adapt.inv_mass, adapt.metric, P)
    return P * adapt.inv_mass[None, :]


def metric_momentum(cfg: NutsConfig, adapt, gauss: jax.Array) -> jax.Array:
    """p ~ N(0, M) from standard gaussians."""
    if cfg.low_rank is not None:
        return lr_sample_momentum(adapt.inv_mass, adapt.metric, gauss)
    return gauss / jnp.sqrt(adapt.inv_mass)


def _lr_metric(cfg: NutsConfig, adapt):
    """Low-rank metric object, or None for the diagonal/flow cases."""
    return adapt.metric if cfg.low_rank is not None else None


def turn_velocity(cfg: NutsConfig, adapt, p: jax.Array) -> jax.Array:
    """Velocity used in U-turn dot products.

    Exact-normal: v = M^{-1} p.  Microcanonical: the stored momentum is
    already the whitened-space unit velocity, so the criterion is
    ``dot(rho_u, u_end) <= 0`` with identity scaling.
    """
    if cfg.kinetic == "microcanonical":
        return p
    return metric_velocity(cfg, adapt, p)


def turn_velocity_rows(cfg: NutsConfig, adapt, P: jax.Array) -> jax.Array:
    if cfg.kinetic == "microcanonical":
        return P
    return metric_velocity_rows(cfg, adapt, P)


# slot layout of the packed per-draw scalar statistics buffer; integers and
# booleans are stored in the float dtype (exact well past their ranges) and
# restored on the host
SCALAR_SLOTS = {
    "logp": 0,
    "energy": 1,
    "depth": 2,
    "maxdepth_reached": 3,
    "diverging": 4,
    "step_size": 5,
    "step_size_bar": 6,
    "n_steps": 7,
    "mean_tree_accept": 8,
    "index_in_trajectory": 9,
    "fisher_distance": 10,
}
N_SCALAR_SLOTS = 12


def _slot(scalars: jax.Array, name: str) -> jax.Array:
    return scalars[..., SCALAR_SLOTS[name]]


class ChunkBuffers(NamedTuple):
    """Per-chain output buffers for one chunk of draws ([chunk_len, ...]).

    The ~11 per-draw scalar statistics are packed into one
    ``scalars [L, N_SCALAR_SLOTS]`` buffer so each completed draw costs two
    masked row writes (scalars + position) instead of a dozen.  Named
    accessors expose the individual statistics.  Writes go through
    :func:`nutpie_tpu.ops.row_write.masked_row_write` (backend-aware:
    select on TPU, scatter elsewhere).
    """

    position: jax.Array             # [L, dim] unconstrained draws
    scalars: jax.Array              # [L, N_SCALAR_SLOTS]
    gradient: Optional[jax.Array]          # [L, dim] if store_gradient
    mass_matrix_inv: Optional[jax.Array]   # [L, dim] if store_mass_matrix
    divergence_start: Optional[jax.Array]  # [L, dim] if store_divergences
    divergence_end: Optional[jax.Array]
    divergence_momentum: Optional[jax.Array]
    divergence_start_gradient: Optional[jax.Array]
    transformed_position: Optional[jax.Array]   # [L, dim] (flow + store_transformed)
    transformed_gradient: Optional[jax.Array]
    transformation_mu: Optional[jax.Array]
    mass_matrix_eigvals: Optional[jax.Array]    # [L, max_rank] (low_rank)
    # uniform-leaf orbit samples for flow training (flow.use_orbit)
    orbit_position: Optional[jax.Array]         # [L, dim]
    orbit_gradient: Optional[jax.Array]

    @property
    def logp(self):
        return _slot(self.scalars, "logp")

    @property
    def energy(self):
        return _slot(self.scalars, "energy")

    @property
    def depth(self):
        return _slot(self.scalars, "depth").astype(jnp.int32)

    @property
    def maxdepth_reached(self):
        return _slot(self.scalars, "maxdepth_reached") > 0.5

    @property
    def diverging(self):
        return _slot(self.scalars, "diverging") > 0.5

    @property
    def step_size(self):
        return _slot(self.scalars, "step_size")

    @property
    def step_size_bar(self):
        return _slot(self.scalars, "step_size_bar")

    @property
    def n_steps(self):
        return _slot(self.scalars, "n_steps").astype(jnp.int32)

    @property
    def mean_tree_accept(self):
        return _slot(self.scalars, "mean_tree_accept")

    @property
    def index_in_trajectory(self):
        return _slot(self.scalars, "index_in_trajectory").astype(jnp.int32)

    @property
    def fisher_distance(self):
        return _slot(self.scalars, "fisher_distance")


def init_buffers(cfg: NutsConfig, chunk_len: int, dim: int, dtype,
                 n_chains: int | None = None) -> ChunkBuffers:
    """Allocate output buffers.

    Pass ``n_chains`` to build the batched buffers directly: materialized
    [chains, chunk, ...] allocations (building them as vmapped/broadcasted
    constants leaves them as lazy broadcasts that the in-loop scatter
    updates interact badly with on some backends).
    """
    lead = () if n_chains is None else (n_chains,)
    f = lambda *shape: jnp.full(lead + shape, jnp.nan, dtype)
    L = chunk_len
    # low-rank and flow adaptation consume the chunk's gradients at chunk
    # boundaries, so the gradient buffer is allocated for them too
    need_gradient = (
        cfg.store_gradient or cfg.flow is not None or cfg.low_rank is not None
    )
    return ChunkBuffers(
        position=f(L, dim),
        scalars=f(L, N_SCALAR_SLOTS),
        gradient=f(L, dim) if need_gradient else None,
        mass_matrix_inv=f(L, dim) if cfg.store_mass_matrix else None,
        divergence_start=f(L, dim) if cfg.store_divergences else None,
        divergence_end=f(L, dim) if cfg.store_divergences else None,
        divergence_momentum=f(L, dim) if cfg.store_divergences else None,
        divergence_start_gradient=f(L, dim) if cfg.store_divergences else None,
        transformed_position=(
            f(L, dim) if cfg.flow is not None and cfg.store_transformed else None
        ),
        transformed_gradient=(
            f(L, dim) if cfg.flow is not None and cfg.store_transformed else None
        ),
        transformation_mu=(
            f(L, dim) if cfg.flow is not None and cfg.store_transformed else None
        ),
        mass_matrix_eigvals=(
            f(L, cfg.low_rank.max_rank)
            if cfg.low_rank is not None and cfg.store_mass_matrix else None
        ),
        orbit_position=(
            f(L, dim)
            if cfg.flow is not None and cfg.flow.use_orbit else None
        ),
        orbit_gradient=(
            f(L, dim)
            if cfg.flow is not None and cfg.flow.use_orbit else None
        ),
    )


def _w(mask, new, old):
    """Masked select broadcasting a boolean over trailing dims.

    Under :func:`mosaic` spellings the rank expansion happens on an i32 copy
    of the mask (Mosaic cannot reshape i1 vectors) and boolean DATA is
    selected in logical form (boolean selects lower through i8 truncations
    Mosaic rejects).  The default XLA spelling is a plain ``jnp.where``.
    """
    new = jnp.asarray(new)
    m = jnp.asarray(mask)
    if mosaic():
        if m.ndim < new.ndim:
            m32 = m.astype(jnp.int32).reshape(
                m.shape + (1,) * (new.ndim - m.ndim)
            )
            m = m32 != 0
        if new.dtype == jnp.bool_:
            return (m & new) | (~m & jnp.asarray(old))
        return jnp.where(m, new, old)
    if m.ndim < new.ndim:
        m = m.reshape(m.shape + (1,) * (new.ndim - m.ndim))
    return jnp.where(m, new, old)


def _raw_key(rng_key) -> bool:
    """True when the state carries raw uint32[2] key data instead of a typed
    jax.random key (the megakernel path; see ops/threefry.py)."""
    return getattr(rng_key, "dtype", None) == jnp.uint32


def n_vec_rows(cfg: NutsConfig) -> int:
    return N_VEC_DIV if cfg.store_divergences else N_VEC_BASE


def _pack_flts(dtype, **values) -> jax.Array:
    rows = [None] * N_FLT
    for name, idx in FLT_SLOTS.items():
        rows[idx] = jnp.asarray(values[name]).astype(dtype)
    return jnp.stack(rows)


def _pack_ints(**values) -> jax.Array:
    rows = [None] * N_INT
    for name, idx in INT_SLOTS.items():
        rows[idx] = jnp.asarray(values[name]).astype(jnp.int32)
    return jnp.stack(rows)


def _pack_vecs(cfg: NutsConfig, **values) -> jax.Array:
    n = n_vec_rows(cfg)
    rows = [None] * n
    for name, idx in VEC_SLOTS.items():
        rows[idx] = values[name]
    if cfg.store_divergences:
        for name, idx in DIV_SLOTS.items():
            rows[idx] = values[name]
    return jnp.stack(rows)


def start_draw(
    cfg: NutsConfig,
    sched: Schedule,
    state: NutsMachineState,
    gauss: jax.Array,
    jitter_u: jax.Array,
) -> NutsMachineState:
    """Refresh momentum and reset trajectory/subtree state for a new draw."""
    dtype = state.vecs.dtype
    adapt = state.adapt
    position = state.position
    gradient = state.gradient
    logp = state.logp
    tuning = state.draw_idx < sched.num_tune
    log_eps = jnp.where(tuning, adapt.da.log_step, adapt.da.log_step_bar)
    eps = jnp.exp(log_eps)
    if cfg.adapt.step_size_jitter is not None:
        eps = eps * (1.0 + cfg.adapt.step_size_jitter * (2.0 * jitter_u - 1.0))
    if cfg.kinetic == "microcanonical":
        # unit velocity, uniform on the whitened-space sphere; the kinetic
        # weight starts at zero so h0 is pure potential
        norm = jnp.sqrt(jnp.sum(gauss * gauss))
        p0 = gauss / jnp.maximum(norm, 1e-30)
        h0 = -logp
    else:
        p0 = metric_momentum(cfg, adapt, gauss)
        ke = 0.5 * _vdot(p0, metric_velocity(cfg, adapt, p0))
        h0 = -logp + ke
    dim = position.shape[-1]
    nan_vec = jnp.full((dim,), jnp.nan, dtype)
    zero_s = jnp.zeros((), dtype)
    zero_i = jnp.zeros((), jnp.int32)
    vec_values = dict(
        z_minus=position, p_minus=p0, g_minus=gradient,
        z_plus=position, p_plus=p0, g_plus=gradient,
        rho=p0,
        rho_sub=jnp.zeros((dim,), dtype),
        prop_z=position, prop_g=gradient,
        sprop_z=position, sprop_g=gradient,
        position=position, gradient=gradient,
    )
    if cfg.store_divergences:
        vec_values.update(
            div_start=nan_vec, div_start_grad=nan_vec,
            div_end=nan_vec, div_mom=nan_vec,
        )
    return state._replace(
        vecs=_pack_vecs(cfg, **vec_values),
        flts=_pack_flts(
            dtype,
            logp=logp,
            eps=eps,
            h0=h0,
            logw_traj=zero_s,
            prop_logp=logp,
            prop_energy=h0,
            logw_sub=-jnp.inf,
            sprop_logp=logp,
            sprop_energy=h0,
            sum_acc=zero_s,
            ke_minus=zero_s,
            ke_plus=zero_s,
        ),
        ints=_pack_ints(
            draw_idx=state.draw_idx,
            prop_idx=zero_i,
            depth=zero_i,
            direction=jnp.ones((), jnp.int32),
            left_idx=zero_i,
            right_idx=zero_i,
            n_leaves=zero_i,
            n_leaf=zero_i,
            sprop_idx=zero_i,
            ckpt_top=zero_i,
            total_steps=state.total_steps,
            divergence_count=state.divergence_count,
            diverging=zero_i,
            turning_sub=zero_i,
            done=state.ints[INT_SLOTS["done"]],
        ),
    )


def init_machine_state(
    cfg: NutsConfig,
    chain_key: jax.Array,
    position: jax.Array,
    gradient: jax.Array,
    logp: jax.Array,
    dtype,
) -> NutsMachineState:
    """Build the initial per-chain state (before the first chunk)."""
    dim = position.shape[-1]
    # checkpoint stack: a subtree of size 2^depth uses slots 0..depth-1 with
    # depth <= maxdepth-1; slot D-1 additionally stashes the old edge momentum
    D = max(cfg.maxdepth, 2)
    position = position.astype(dtype)
    gradient = gradient.astype(dtype)
    zvec = jnp.zeros((dim,), dtype)
    nan_vec = jnp.full((dim,), jnp.nan, dtype)
    zs = jnp.zeros((), dtype)
    zi = jnp.zeros((), jnp.int32)
    adapt = diag_adapt_init(cfg.adapt, gradient, dtype)
    if cfg.low_rank is not None:
        adapt = LowRankAdaptState(
            **adapt._asdict(),
            metric=identity_metric(dim, cfg.low_rank.max_rank, dtype),
        )
    elif cfg.flow is not None:
        W = cfg.flow.window
        adapt = FlowAdaptState(
            **{**adapt._asdict(), "inv_mass": jnp.ones((dim,), dtype)},
            win_draws=jnp.zeros((W, dim), dtype),
            win_grads=jnp.zeros((W, dim), dtype),
            win_valid=jnp.zeros((W,), bool),
            flow=init_flow_params(cfg.flow, dim, chain_key, dtype),
            flow_updates=zi,
        )
    vec_values = dict(
        z_minus=zvec, p_minus=zvec, g_minus=zvec,
        z_plus=zvec, p_plus=zvec, g_plus=zvec,
        rho=zvec, rho_sub=zvec,
        prop_z=zvec, prop_g=zvec,
        sprop_z=zvec, sprop_g=zvec,
        position=position, gradient=gradient,
    )
    if cfg.store_divergences:
        vec_values.update(
            div_start=nan_vec, div_start_grad=nan_vec,
            div_end=nan_vec, div_mom=nan_vec,
        )
    use_orbit = cfg.flow is not None and cfg.flow.use_orbit
    return NutsMachineState(
        rng_key=chain_key,
        adapt=adapt,
        orbit_z=zvec if use_orbit else None,
        orbit_g=zvec if use_orbit else None,
        vecs=_pack_vecs(cfg, **vec_values),
        ckpt_p=jnp.zeros((D, dim), dtype),
        ckpt_s=jnp.zeros((D, dim), dtype),
        flts=_pack_flts(
            dtype,
            logp=logp.astype(dtype),
            eps=jnp.asarray(cfg.adapt.initial_step, dtype),
            h0=zs, logw_traj=zs, prop_logp=zs, prop_energy=zs,
            logw_sub=-jnp.inf, sprop_logp=zs, sprop_energy=zs,
            sum_acc=zs, ke_minus=zs, ke_plus=zs,
        ),
        ints=_pack_ints(
            draw_idx=zi, prop_idx=zi, depth=zi,
            direction=jnp.ones((), jnp.int32),
            left_idx=zi, right_idx=zi, n_leaves=zi, n_leaf=zi,
            sprop_idx=zi, ckpt_top=zi, total_steps=zi,
            divergence_count=zi, diverging=zi, turning_sub=zi, done=zi,
        ),
    )


def _any(x) -> jax.Array:
    """Reduce-any.  Mosaic spelling: i32 sum+compare (Mosaic lowers
    boolean-vector reductions through i8 truncations it cannot compile).
    XLA spelling: plain ``jnp.any``."""
    if mosaic():
        return jnp.sum(jnp.where(x, 1, 0)) > 0
    return jnp.any(x)


def _vdot(a, b):
    """Vector dot.  Mosaic spelling: multiply+sum (a VPU reduce; vmapped
    ``dot_general`` over the kernel's chain tile produces dimension numbers
    Mosaic cannot parse).  XLA spelling: ``jnp.dot``."""
    if mosaic():
        return jnp.sum(a * b, axis=-1)
    return jnp.dot(a, b)


def _turn(rho, v_a, v_b):
    """Generalized U-turn criterion given end velocities v = M^{-1} p."""
    return (_vdot(rho, v_a) <= 0) | (_vdot(rho, v_b) <= 0)


def machine_step(
    cfg: NutsConfig,
    logp_and_grad,
    sched: Schedule,
    mom_gauss: jax.Array,   # [chunk_len, dim] per-draw momentum gaussians
    jitter_us: jax.Array,   # [chunk_len]
    chunk_start: jax.Array, # scalar i32 (dynamic)
    limit: jax.Array,       # scalar i32: draws to produce this chunk (dynamic)
    s: NutsMachineState,
    bufs: ChunkBuffers,
    adapt_frozen: bool = False,
) -> tuple[NutsMachineState, ChunkBuffers]:
    """Advance one chain by one leapfrog step (vmapped over chains).

    ``adapt_frozen=True`` compiles out the warmup-adaptation update entirely
    (used for post-warmup chunks: the adaptation state is a large fraction
    of per-step memory traffic).
    """
    dtype = s.vecs.dtype
    D = s.ckpt_p.shape[0]

    # ------------------------------------------------ unpack packed state
    V, F, I = VEC_SLOTS, FLT_SLOTS, INT_SLOTS
    in_z_minus = s.vecs[V["z_minus"]]
    in_p_minus = s.vecs[V["p_minus"]]
    in_g_minus = s.vecs[V["g_minus"]]
    in_z_plus = s.vecs[V["z_plus"]]
    in_p_plus = s.vecs[V["p_plus"]]
    in_g_plus = s.vecs[V["g_plus"]]
    in_rho = s.vecs[V["rho"]]
    in_rho_sub = s.vecs[V["rho_sub"]]
    in_prop_z = s.vecs[V["prop_z"]]
    in_prop_g = s.vecs[V["prop_g"]]
    in_sprop_z = s.vecs[V["sprop_z"]]
    in_sprop_g = s.vecs[V["sprop_g"]]
    in_position = s.vecs[V["position"]]
    in_gradient = s.vecs[V["gradient"]]

    in_logp = s.flts[F["logp"]]
    in_eps = s.flts[F["eps"]]
    in_h0 = s.flts[F["h0"]]
    in_logw_traj = s.flts[F["logw_traj"]]
    in_prop_logp = s.flts[F["prop_logp"]]
    in_prop_energy = s.flts[F["prop_energy"]]
    in_logw_sub = s.flts[F["logw_sub"]]
    in_sprop_logp = s.flts[F["sprop_logp"]]
    in_sprop_energy = s.flts[F["sprop_energy"]]
    in_sum_acc = s.flts[F["sum_acc"]]
    in_ke_minus = s.flts[F["ke_minus"]]
    in_ke_plus = s.flts[F["ke_plus"]]

    in_draw_idx = s.ints[I["draw_idx"]]
    in_prop_idx = s.ints[I["prop_idx"]]
    in_depth = s.ints[I["depth"]]
    in_direction = s.ints[I["direction"]]
    in_left_idx = s.ints[I["left_idx"]]
    in_right_idx = s.ints[I["right_idx"]]
    in_n_leaves = s.ints[I["n_leaves"]]
    in_n_leaf = s.ints[I["n_leaf"]]
    in_sprop_idx = s.ints[I["sprop_idx"]]
    in_ckpt_top = s.ints[I["ckpt_top"]]
    in_total_steps = s.ints[I["total_steps"]]
    in_divergence_count = s.ints[I["divergence_count"]]
    in_diverging = s.ints[I["diverging"]] > 0
    in_turning_sub = s.ints[I["turning_sub"]] > 0
    in_done = s.ints[I["done"]] > 0

    active = ~in_done

    # ------------------------------------------------ scalar randomness
    # The state's rng_key is either a typed jax.random key (XLA path) or its
    # raw uint32[2] key data (megakernel path: typed-key primitives do not
    # lower in Mosaic).  Both dispatch to the same Threefry streams --
    # ops/threefry.py is bit-equal to jax.random (tests/test_threefry.py) --
    # so draws are identical whichever path executes the step.
    if _raw_key(s.rng_key):
        from ..ops import threefry as _tf

        ku = _tf.fold_in_data(_tf.fold_in_data(s.rng_key, 3), in_total_steps)
        u3 = _tf.uniform3(ku).astype(dtype)
    else:
        ku = jax.random.fold_in(
            jax.random.fold_in(s.rng_key, 3), in_total_steps
        )
        u3 = jax.random.uniform(ku, (3,), jnp.float32).astype(dtype)

    # ------------------------------------------------ doubling start
    at_start = in_n_leaf == 0
    new_dir = jnp.where(u3[0] < 0.5, -1, 1).astype(jnp.int32)
    direction = jnp.where(at_start, new_dir, in_direction)
    fwd = direction > 0

    # Momentum of the old trajectory's end on the integration side, needed for
    # the Stan-style cross U-turn checks at merge time.  The edge buffer is
    # overwritten during subtree integration, so capture it at doubling start
    # in checkpoint slot D-1, which the stack never reaches: a subtree of
    # size 2^depth uses stack indices 0..depth-1 and depth <= maxdepth-1.
    edge_p_old = jnp.where(fwd, in_p_plus, in_p_minus)
    ckpt_p = masked_row_write(
        s.ckpt_p, jnp.int32(D - 1), at_start & active, edge_p_old
    )
    ckpt_s = s.ckpt_s

    # ------------------------------------------------ leapfrog (1 gradient)
    z_e = jnp.where(fwd, in_z_plus, in_z_minus)
    p_e = jnp.where(fwd, in_p_plus, in_p_minus)
    g_e = jnp.where(fwd, in_g_plus, in_g_minus)
    eps_s = direction.astype(dtype) * in_eps
    if cfg.kinetic == "microcanonical":
        # isokinetic leapfrog (MAMS): velocity half-update, position full
        # step along A u, velocity half-update; the kinetic-energy weight
        # accumulates per trajectory edge (ke_minus/ke_plus)
        from .mclmc import _apply_A, _apply_At, _update_velocity

        dim = z_e.shape[-1]
        metric_obj = _lr_metric(cfg, s.adapt)
        inv_mass = s.adapt.inv_mass
        ke_edge = jnp.where(fwd, in_ke_plus, in_ke_minus)
        gt_e = -_apply_At(inv_mass, metric_obj, g_e)
        u_half, dke1 = _update_velocity(p_e, gt_e, 0.5 * eps_s, dim)
        z_new = z_e + eps_s * _apply_A(inv_mass, metric_obj, u_half)
        logp_new, g_new = logp_and_grad(z_new, s.adapt)
        logp_new = logp_new.astype(dtype)
        g_new = g_new.astype(dtype)
        gt_new = -_apply_At(inv_mass, metric_obj, g_new)
        p_new, dke2 = _update_velocity(u_half, gt_new, 0.5 * eps_s, dim)
        ke_new_edge = ke_edge + dke1 + dke2
        h = -logp_new + ke_new_edge
        v_new = p_new
        ke_plus = _w(active & fwd, ke_new_edge, in_ke_plus)
        ke_minus = _w(active & ~fwd, ke_new_edge, in_ke_minus)
    else:
        p_half = p_e + 0.5 * eps_s * g_e
        z_new = z_e + eps_s * metric_velocity(cfg, s.adapt, p_half)
        logp_new, g_new = logp_and_grad(z_new, s.adapt)
        logp_new = logp_new.astype(dtype)
        g_new = g_new.astype(dtype)
        p_new = p_half + 0.5 * eps_s * g_new
        v_new = metric_velocity(cfg, s.adapt, p_new)
        ke = 0.5 * _vdot(p_new, v_new)
        h = -logp_new + ke
        ke_plus = in_ke_plus
        ke_minus = in_ke_minus

    # ------------------------------------------------ leaf processing
    n = in_n_leaf + 1
    e_err = h - in_h0
    finite = jnp.isfinite(e_err)
    # Stagnation = divergence: when eps falls below the float resolution of
    # the position, z + eps*v == z bitwise -- the trajectory cannot be
    # integrated, never U-turns, and would run a full maxdepth tree (1023
    # gradients) every draw, which every lockstep chain waits out (<1%
    # numerically-dead chains stalled the 2048-chain TPU bench 25x).
    # Treating the unintegrable step as a (recoverable) divergence ends the
    # draw after one leapfrog, matching the reference's recoverable-logp-
    # error semantics (``LogpError::is_recoverable``, src/pymc.rs:166-181).
    stagnant = ~_any(z_new != z_e) if mosaic() else jnp.all(z_new == z_e)
    div_leaf = (~finite) | (e_err > cfg.max_energy_error) | stagnant
    lw = jnp.where(div_leaf, -jnp.inf, -e_err)
    acc = jnp.where(finite, jnp.exp(jnp.minimum(jnp.zeros((), dtype), -e_err)), 0.0)

    sum_acc = _w(active, in_sum_acc + acc, in_sum_acc)
    n_leaves = _w(active, in_n_leaves + 1, in_n_leaves)

    use_orbit = cfg.flow is not None and cfg.flow.use_orbit
    if use_orbit:
        # uniform-leaf reservoir over the draw's whole trajectory
        # (train_on_orbit: the flow trains on orbit points, which cover the
        # trajectory uniformly rather than multinomially); the dedicated
        # fold keeps the main u3 streams untouched
        if _raw_key(ku):
            from ..ops import threefry as _tf

            u_orb = _tf.uniform1(_tf.fold_in_data(ku, 1)).astype(dtype)
        else:
            u_orb = jax.random.uniform(
                jax.random.fold_in(ku, 1), (), jnp.float32
            ).astype(dtype)
        take_orbit = active & (u_orb * n_leaves.astype(dtype) <= 1.0)
        orbit_z = _w(take_orbit, z_new, s.orbit_z)
        orbit_g = _w(take_orbit, g_new, s.orbit_g)
    else:
        orbit_z = None
        orbit_g = None
    total_steps = _w(active, in_total_steps + 1, in_total_steps)

    abs_idx = jnp.where(fwd, in_right_idx + 1, in_left_idx - 1)
    right_idx = _w(active & fwd, in_right_idx + 1, in_right_idx)
    left_idx = _w(active & ~fwd, in_left_idx - 1, in_left_idx)

    # progressive multinomial within the subtree
    logw_sub_new = jnp.logaddexp(in_logw_sub, lw)
    take = jnp.log(u3[1]) < (lw - logw_sub_new)
    take = take & ~jnp.isnan(lw - logw_sub_new)
    m_take = active & take
    sprop_z = _w(m_take, z_new, in_sprop_z)
    sprop_g = _w(m_take, g_new, in_sprop_g)
    sprop_logp = _w(m_take, logp_new, in_sprop_logp)
    sprop_energy = _w(m_take, h, in_sprop_energy)
    sprop_idx = _w(m_take, abs_idx, in_sprop_idx)

    rho_sub_pre = in_rho_sub
    rho_sub_new = rho_sub_pre + p_new

    # checkpoint stack: push at odd leaves, check+pop at even leaves
    odd = (n % 2) == 1
    top = in_ckpt_top
    push = active & odd
    ckpt_p = masked_row_write(ckpt_p, top, push, p_new)
    ckpt_s = masked_row_write(ckpt_s, top, push, rho_sub_pre)
    top_after_push = jnp.where(push, top + 1, top)

    # trailing zeros of n (for even n): subtrees of sizes 2^1..2^t end here.
    # Computed from the f32 exponent bits of the lowest set bit -- exact for
    # n < 2**24 (n <= 2**maxdepth here) and elementwise-only, so it lowers in
    # Mosaic where lax.population_count does not.
    lsb_f = (n & -n).astype(jnp.float32)
    tz = (
        jax.lax.shift_right_logical(
            jax.lax.bitcast_convert_type(lsb_f, jnp.int32),
            jnp.int32(23),
        )
        - jnp.int32(127)
    )
    even = active & ~odd
    if cfg.check_turning:
        # vectorized checks against the top `tz` checkpoints
        slots = jnp.arange(D)
        slot_mask = (slots < top_after_push) & (slots >= top_after_push - tz)
        rho_ab = rho_sub_new[None, :] - ckpt_s        # [D, dim]
        d_a = jnp.sum(rho_ab * turn_velocity_rows(cfg, s.adapt, ckpt_p), axis=1)
        d_b = (
            jnp.sum(rho_ab * v_new[None, :], axis=1)
            if mosaic() else rho_ab @ v_new
        )
        turn_vec = (d_a <= 0) | (d_b <= 0)
        turning_here = _any(turn_vec & slot_mask)
        turning_sub_mid = in_turning_sub | (even & turning_here)
    else:
        turning_sub_mid = in_turning_sub
    top_new = jnp.where(even, top_after_push - jnp.maximum(tz - 1, 0), top_after_push)

    # ------------------------------------------------ subtree completion
    subtree_size = jax.lax.shift_left(jnp.ones((), jnp.int32), in_depth)
    full = n >= subtree_size
    sub_invalid = div_leaf | turning_sub_mid
    sub_done = active & (full | sub_invalid)
    merge_ok = sub_done & ~sub_invalid

    # biased progressive sampling at the merge
    log_ratio = logw_sub_new - in_logw_traj
    take2 = jnp.log(u3[2]) < log_ratio
    take2 = take2 & ~jnp.isnan(log_ratio)
    m_take2 = merge_ok & take2
    prop_z = _w(m_take2, sprop_z, in_prop_z)
    prop_g = _w(m_take2, sprop_g, in_prop_g)
    prop_logp = _w(m_take2, sprop_logp, in_prop_logp)
    prop_energy = _w(m_take2, sprop_energy, in_prop_energy)
    prop_idx = _w(m_take2, sprop_idx, in_prop_idx)

    logw_traj = _w(merge_ok, jnp.logaddexp(in_logw_traj, logw_sub_new), in_logw_traj)
    rho_full = in_rho + rho_sub_new
    rho = _w(merge_ok, rho_full, in_rho)

    # U-turn checks on the merged trajectory (main + Stan-style cross checks)
    if cfg.check_turning:
        far_p = jnp.where(fwd, in_p_minus, in_p_plus)
        first_new_p = ckpt_p[0]
        edge_old_p = ckpt_p[D - 1]
        v_far = turn_velocity(cfg, s.adapt, far_p)
        v_first_new = turn_velocity(cfg, s.adapt, first_new_p)
        v_edge_old = turn_velocity(cfg, s.adapt, edge_old_p)
        t1 = _turn(rho_full, v_far, v_new)
        t2 = _turn(in_rho + first_new_p, v_far, v_first_new)
        t3 = _turn(rho_sub_new + edge_old_p, v_edge_old, v_new)
        turning_traj = merge_ok & (t1 | t2 | t3)
        turning_traj &= (in_depth + 1) >= cfg.mindepth
    else:
        turning_traj = jnp.zeros((), bool)

    if cfg.target_time is not None:
        # dynamic per-draw doubling limit: first depth whose integration time
        # 2^depth * eps covers the target, plus extra_doublings
        req = jnp.ceil(
            jnp.log2(jnp.maximum(cfg.target_time / in_eps, 1.0))
        ).astype(jnp.int32) + cfg.extra_doublings
        depth_limit = jnp.clip(req, max(cfg.mindepth, 1), cfg.maxdepth)
    else:
        depth_limit = jnp.asarray(cfg.maxdepth, jnp.int32)
    # fleet-relative work cap (see Schedule.depth_cap); >= mindepth+1 so
    # mindepth settings stay honored
    depth_limit = jnp.maximum(
        jnp.minimum(depth_limit, sched.depth_cap),
        max(cfg.mindepth, 1),
    )
    ended_by_depth = merge_ok & ((in_depth + 1) >= depth_limit)
    draw_done = sub_done & (sub_invalid | turning_traj | ended_by_depth)

    # next doubling (when merged and continuing)
    next_doubling = merge_ok & ~draw_done
    depth = _w(next_doubling, in_depth + 1, in_depth)
    n_leaf = _w(active, jnp.where(next_doubling, 0, n), in_n_leaf)
    rho_sub = _w(active, jnp.where(next_doubling, jnp.zeros_like(rho_sub_new), rho_sub_new), in_rho_sub)
    logw_sub = _w(active, jnp.where(next_doubling, -jnp.inf, logw_sub_new), in_logw_sub)
    turning_sub = _w(active, turning_sub_mid & ~next_doubling, in_turning_sub)
    top_new = jnp.where(next_doubling, 0, top_new)
    ckpt_top = _w(active, top_new, in_ckpt_top)

    # edge updates from the leapfrog
    z_plus = _w(active & fwd, z_new, in_z_plus)
    p_plus = _w(active & fwd, p_new, in_p_plus)
    g_plus = _w(active & fwd, g_new, in_g_plus)
    z_minus = _w(active & ~fwd, z_new, in_z_minus)
    p_minus = _w(active & ~fwd, p_new, in_p_minus)
    g_minus = _w(active & ~fwd, g_new, in_g_minus)

    # divergence location info
    if cfg.store_divergences:
        m_div = active & div_leaf
        div_start = _w(m_div, z_e, s.vecs[DIV_SLOTS["div_start"]])
        div_start_grad = _w(m_div, g_e, s.vecs[DIV_SLOTS["div_start_grad"]])
        div_end = _w(m_div, z_new, s.vecs[DIV_SLOTS["div_end"]])
        div_mom = _w(m_div, p_e, s.vecs[DIV_SLOTS["div_mom"]])

    diverging = _w(active, in_diverging | div_leaf, in_diverging)

    # ------------------------------------------------ draw completion
    idx = in_draw_idx - chunk_start
    idx_c = jnp.clip(idx, 0, mom_gauss.shape[0] - 1)
    depth_stat = in_depth + 1
    accept_mean = sum_acc / jnp.maximum(n_leaves, 1).astype(dtype)
    md_reached = ended_by_depth & ~turning_traj
    tuning = in_draw_idx < sched.num_tune
    step_size_bar = jnp.exp(s.adapt.da.log_step_bar)

    # Masked buffer writes go through the backend-aware row writer (batched
    # TPU scatters into large buffers miscompile; see ops/row_write.py).
    def write(buf, value):
        if buf is None:
            return None
        return masked_row_write(buf, idx_c, draw_done, value)

    if cfg.flow is not None:
        # in base space a perfect flow has score(z) = -z
        fisher_dist = jnp.mean(jnp.square(prop_z + prop_g))
    else:
        fisher_dist = jnp.zeros((), dtype)
    # stat row assembled by slot position; Mosaic spelling uses one stack
    # (per-slot ``.at[].set`` lowers as scatter, which Mosaic cannot express)
    _slot_values = {
        "logp": prop_logp,
        "energy": prop_energy,
        "depth": depth_stat,
        "maxdepth_reached": md_reached,
        "diverging": diverging,
        "step_size": in_eps,
        "step_size_bar": step_size_bar,
        "n_steps": n_leaves,
        "mean_tree_accept": accept_mean,
        "index_in_trajectory": prop_idx,
        "fisher_distance": fisher_dist,
    }
    if mosaic():
        _rows = [jnp.zeros((), dtype)] * N_SCALAR_SLOTS
        for name, value in _slot_values.items():
            _rows[SCALAR_SLOTS[name]] = jnp.asarray(value).astype(dtype)
        scalar_row = jnp.stack(_rows)
    else:
        scalar_row = jnp.zeros((N_SCALAR_SLOTS,), dtype)
        for name, value in _slot_values.items():
            scalar_row = scalar_row.at[SCALAR_SLOTS[name]].set(
                jnp.asarray(value).astype(dtype)
            )
    bufs = ChunkBuffers(
        position=write(bufs.position, prop_z),
        scalars=write(bufs.scalars, scalar_row),
        gradient=write(bufs.gradient, prop_g),
        mass_matrix_inv=write(bufs.mass_matrix_inv, s.adapt.inv_mass),
        divergence_start=(
            write(bufs.divergence_start, div_start)
            if cfg.store_divergences else None
        ),
        divergence_end=(
            write(bufs.divergence_end, div_end)
            if cfg.store_divergences else None
        ),
        divergence_momentum=(
            write(bufs.divergence_momentum, div_mom)
            if cfg.store_divergences else None
        ),
        divergence_start_gradient=(
            write(bufs.divergence_start_gradient, div_start_grad)
            if cfg.store_divergences else None
        ),
        transformed_position=write(bufs.transformed_position, prop_z),
        transformed_gradient=write(bufs.transformed_gradient, prop_g),
        transformation_mu=(
            write(bufs.transformation_mu, s.adapt.flow.mu)
            if bufs.transformation_mu is not None else None
        ),
        mass_matrix_eigvals=(
            write(bufs.mass_matrix_eigvals, jnp.exp(s.adapt.metric.log_eigs))
            if bufs.mass_matrix_eigvals is not None else None
        ),
        orbit_position=(
            write(bufs.orbit_position, orbit_z)
            if bufs.orbit_position is not None else None
        ),
        orbit_gradient=(
            write(bufs.orbit_gradient, orbit_g)
            if bufs.orbit_gradient is not None else None
        ),
    )

    # adaptation (tuning draws only)
    if adapt_frozen:
        adapt = s.adapt
    else:
        adapt_new = diag_adapt_update(
            cfg.adapt, sched, s.adapt, in_draw_idx, prop_z, prop_g, accept_mean,
            diverging,
        )
        # window data for low-rank/flow training comes from the chunk's draw
        # buffers at chunk boundaries (run.py) -- no per-step window writes
        adapt = tree_where(draw_done & tuning, adapt_new, s.adapt)
        # at the end of tuning, freeze the step size at its averaged value
        end_of_tuning = draw_done & (in_draw_idx == sched.num_tune - 1)
        adapt = adapt._replace(
            da=adapt.da._replace(
                log_step=jnp.where(
                    end_of_tuning, adapt.da.log_step_bar, adapt.da.log_step
                )
            )
        )

    divergence_count = _w(draw_done & diverging, in_divergence_count + 1, in_divergence_count)
    draw_idx = _w(draw_done, in_draw_idx + 1, in_draw_idx)
    done = in_done | (draw_done & (idx + 1 >= limit))

    # ------------------------------------------------ reassemble packed state
    vec_values = dict(
        z_minus=z_minus, p_minus=p_minus, g_minus=g_minus,
        z_plus=z_plus, p_plus=p_plus, g_plus=g_plus,
        rho=rho, rho_sub=rho_sub,
        prop_z=prop_z, prop_g=prop_g,
        sprop_z=sprop_z, sprop_g=sprop_g,
        position=_w(draw_done, prop_z, in_position),
        gradient=_w(draw_done, prop_g, in_gradient),
    )
    if cfg.store_divergences:
        vec_values.update(
            div_start=div_start, div_start_grad=div_start_grad,
            div_end=div_end, div_mom=div_mom,
        )
    state = s._replace(
        adapt=adapt,
        orbit_z=orbit_z,
        orbit_g=orbit_g,
        vecs=_pack_vecs(cfg, **vec_values),
        ckpt_p=ckpt_p,
        ckpt_s=ckpt_s,
        flts=_pack_flts(
            dtype,
            logp=_w(draw_done, prop_logp, in_logp),
            eps=in_eps,
            h0=in_h0,
            logw_traj=logw_traj,
            prop_logp=prop_logp,
            prop_energy=prop_energy,
            logw_sub=logw_sub,
            sprop_logp=sprop_logp,
            sprop_energy=sprop_energy,
            sum_acc=sum_acc,
            ke_minus=ke_minus,
            ke_plus=ke_plus,
        ),
        ints=_pack_ints(
            draw_idx=draw_idx,
            prop_idx=prop_idx,
            depth=depth,
            direction=_w(active, direction, in_direction),
            left_idx=left_idx,
            right_idx=right_idx,
            n_leaves=n_leaves,
            n_leaf=n_leaf,
            sprop_idx=sprop_idx,
            ckpt_top=ckpt_top,
            total_steps=total_steps,
            divergence_count=divergence_count,
            diverging=diverging,
            turning_sub=turning_sub,
            done=done,
        ),
    )

    # start the next draw for chains that completed one and aren't done
    # (row_read = buf[idx] with a Mosaic-lowerable batched rule)
    restart = draw_done & ~done
    next_idx_c = jnp.clip(idx + 1, 0, mom_gauss.shape[0] - 1)
    started = start_draw(
        cfg, sched, state,
        row_read(mom_gauss, next_idx_c), row_read(jitter_us, next_idx_c),
    )
    state = tree_where(restart, started, state)
    return state, bufs
