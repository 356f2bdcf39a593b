"""Chain-state pytrees for the vectorized NUTS machine.

The reference runs one OS thread per chain with mutable Rust state
(nuts-rs ``Chain`` objects).  The TPU-native design makes every piece of
per-chain state an explicit JAX array batched over a leading chains axis, so
the whole sampler is a pure function jitted once and sharded over the device
mesh.  All fields of :class:`NutsMachineState` are per-chain; ``vmap``
introduces the chains axis.

Memory layout: the ~14 per-chain ``[dim]`` trajectory vectors are packed
into one ``vecs [NV, dim]`` array, the float scalars into ``flts [NF]`` and
the integer/boolean scalars into ``ints [NI]``.  A machine step unpacks to
locals, computes, and reassembles with three stacks -- identical arithmetic
to a field-per-array layout, but the ``lax.while_loop`` carries ~7 buffers
instead of ~45, which collapses the per-step kernel count on TPU (each
carried buffer is a separate HBM round trip per iteration).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.spellings import mosaic


class DualAvgState(NamedTuple):
    """Nesterov dual averaging state (Hoffman & Gelman 2014, sec 3.2.1)."""

    log_step: jax.Array      # current log step size
    log_step_bar: jax.Array  # averaged log step size
    hbar: jax.Array          # running average of (target_accept - accept)
    mu: jax.Array            # shrinkage target, log(10 * eps_at_restart)
    count: jax.Array         # iterations since last restart


class WelfordState(NamedTuple):
    """Running mean/variance accumulator (one per draws/grads stream)."""

    mean: jax.Array  # [dim]
    m2: jax.Array    # [dim]
    count: jax.Array # scalar


class AdamState(NamedTuple):
    m: jax.Array
    v: jax.Array
    count: jax.Array


class DiagAdaptState(NamedTuple):
    """Mass-matrix + step-size adaptation state (diag variant).

    The current/background accumulator pair reproduces the reference's
    expanding-window scheme: both accumulate every draw; at switch points the
    background (with the freshest window of data) becomes current and a new
    empty background starts.
    """

    da: DualAvgState
    adam: AdamState
    inv_mass: jax.Array       # [dim] = diag(M^-1) = posterior variance estimate
    draws_cur: WelfordState
    grads_cur: WelfordState
    draws_bg: WelfordState
    grads_bg: WelfordState


# ------------------------------------------------------------- slot layouts

# [dim]-vector slots of NutsMachineState.vecs.  The first 12 are trajectory
# state reset at each draw start; position/gradient persist across draws.
VEC_SLOTS = {
    "z_minus": 0,
    "p_minus": 1,
    "g_minus": 2,
    "z_plus": 3,
    "p_plus": 4,
    "g_plus": 5,
    "rho": 6,
    "rho_sub": 7,
    "prop_z": 8,
    "prop_g": 9,
    "sprop_z": 10,
    "sprop_g": 11,
    "position": 12,
    "gradient": 13,
}
# divergence-location rows, appended only when store_divergences is set
DIV_SLOTS = {
    "div_start": 14,
    "div_start_grad": 15,
    "div_end": 16,
    "div_mom": 17,
}
N_VEC_BASE = 14
N_VEC_DIV = 18

# float scalar slots of NutsMachineState.flts
FLT_SLOTS = {
    "logp": 0,
    "eps": 1,
    "h0": 2,
    "logw_traj": 3,
    "prop_logp": 4,
    "prop_energy": 5,
    "logw_sub": 6,
    "sprop_logp": 7,
    "sprop_energy": 8,
    "sum_acc": 9,
    # microcanonical kinetic-weight accumulators (unused rows cost nothing
    # under exact_normal; see nuts.py)
    "ke_minus": 10,
    "ke_plus": 11,
}
N_FLT = 12

# integer / boolean scalar slots of NutsMachineState.ints (all i32;
# booleans stored as 0/1)
INT_SLOTS = {
    "draw_idx": 0,
    "prop_idx": 1,
    "depth": 2,
    "direction": 3,
    "left_idx": 4,
    "right_idx": 5,
    "n_leaves": 6,
    "n_leaf": 7,
    "sprop_idx": 8,
    "ckpt_top": 9,
    "total_steps": 10,
    "divergence_count": 11,
    "diverging": 12,
    "turning_sub": 13,
    "done": 14,
}
N_INT = 15


class NutsMachineState(NamedTuple):
    """Complete per-chain state of the flattened NUTS state machine.

    One :func:`nuts.machine_step` advances every chain by exactly one
    leapfrog step; doubling/merge/draw-completion bookkeeping happens inline
    (masked) so chains never wait for each other at draw boundaries -- only
    at chunk boundaries ("Efficiently Vectorized MCMC on Modern
    Accelerators", arXiv:2503.17405, informs this design).
    """

    rng_key: jax.Array
    adapt: DiagAdaptState
    vecs: jax.Array    # [NV, dim] packed vectors (slots: VEC_SLOTS/DIV_SLOTS)
    ckpt_p: jax.Array  # [maxdepth, dim] momentum at checkpoint leaves
    ckpt_s: jax.Array  # [maxdepth, dim] momentum prefix-sum before ckpt leaf
    flts: jax.Array    # [N_FLT] packed float scalars (slots: FLT_SLOTS)
    ints: jax.Array    # [N_INT] packed i32 scalars (slots: INT_SLOTS)
    # uniform-leaf reservoir over the trajectory (flow use_orbit training);
    # None (compiled out) unless the flow's train_on_orbit is enabled
    orbit_z: object = None   # [dim] or None
    orbit_g: object = None   # [dim] or None

    # -- read accessors used outside the machine step (run.py / sample.py /
    #    checkpoint.py); `...` indexing works per-chain and batched alike
    @property
    def position(self):
        return self.vecs[..., VEC_SLOTS["position"], :]

    @property
    def gradient(self):
        return self.vecs[..., VEC_SLOTS["gradient"], :]

    @property
    def logp(self):
        return self.flts[..., FLT_SLOTS["logp"]]

    @property
    def eps(self):
        return self.flts[..., FLT_SLOTS["eps"]]

    @property
    def draw_idx(self):
        return self.ints[..., INT_SLOTS["draw_idx"]]

    @property
    def total_steps(self):
        return self.ints[..., INT_SLOTS["total_steps"]]

    @property
    def divergence_count(self):
        return self.ints[..., INT_SLOTS["divergence_count"]]

    @property
    def done(self):
        return self.ints[..., INT_SLOTS["done"]] > 0


def _row_set(arr, n_rows: int, slot: int, value, *, vec: bool):
    """Write one slot row of a packed array.

    Mosaic spelling: a one-hot broadcast+select (static ``.at[]`` writes
    become ``scatter``, which Mosaic cannot lower inside Pallas kernels).
    XLA spelling: plain ``arr.at[..., slot(, :)].set(value)``.  ``vec=True``
    for the (..., n_rows, dim) vecs layout, ``False`` for the (..., n_rows)
    flts/ints layout.
    """
    if mosaic():
        if vec:
            # vecs layout (..., n_rows, dim); value is (..., dim)
            mask = (jnp.arange(n_rows) == slot)[:, None]
            value = jnp.asarray(value, arr.dtype)[..., None, :]
        else:
            # flts/ints layout (..., n_rows); value is (...,)
            mask = jnp.arange(n_rows) == slot
            value = jnp.asarray(value, arr.dtype)[..., None]
        return jnp.where(mask, value, arr)
    value = jnp.asarray(value, arr.dtype)
    if vec:
        return arr.at[..., slot, :].set(value)
    return arr.at[..., slot].set(value)


def state_with(state: NutsMachineState, *, position=None, gradient=None,
               logp=None, done=None) -> NutsMachineState:
    """Targeted writes into the packed state (chunk-boundary updates)."""
    vecs, flts, ints = state.vecs, state.flts, state.ints
    n_vec = vecs.shape[-2]
    if position is not None:
        vecs = _row_set(vecs, n_vec, VEC_SLOTS["position"], position, vec=True)
    if gradient is not None:
        vecs = _row_set(vecs, n_vec, VEC_SLOTS["gradient"], gradient, vec=True)
    if logp is not None:
        flts = _row_set(flts, N_FLT, FLT_SLOTS["logp"], logp, vec=False)
    if done is not None:
        done = jnp.asarray(done, jnp.int32)
        if done.ndim == 0 and ints.ndim > 1:
            done = jnp.broadcast_to(done, ints.shape[:-1])
        ints = _row_set(ints, N_INT, INT_SLOTS["done"], done, vec=False)
    return state._replace(vecs=vecs, flts=flts, ints=ints)


def tree_where(pred: jax.Array, a, b):
    """Select between two pytrees with a scalar/batched boolean.

    Under Mosaic spellings the rank expansion happens on an i32 copy of the
    predicate (Mosaic cannot reshape i1 vectors) and boolean-data selects use
    the logical form (boolean selects lower through i8 truncations Mosaic
    rejects).  The default XLA spelling is a plain ``jnp.where``.
    """
    if mosaic():
        def sel(x, y):
            p = pred
            x = jnp.asarray(x)
            if p.ndim and x.ndim > p.ndim:
                p32 = p.astype(jnp.int32).reshape(
                    p.shape + (1,) * (x.ndim - p.ndim)
                )
                p = p32 != 0
            if x.dtype == jnp.bool_:
                return (p & x) | (~p & jnp.asarray(y))
            return jnp.where(p, x, y)
    else:
        def sel(x, y):
            p = pred
            x = jnp.asarray(x)
            if p.ndim and x.ndim > p.ndim:
                p = p.reshape(p.shape + (1,) * (x.ndim - p.ndim))
            return jnp.where(p, x, y)
    return jax.tree_util.tree_map(sel, a, b)
