"""Chain-state pytrees for the vectorized NUTS machine.

The reference runs one OS thread per chain with mutable Rust state
(nuts-rs ``Chain`` objects).  The TPU-native design makes every piece of
per-chain state an explicit JAX array batched over a leading chains axis, so
the whole sampler is a pure function jitted once and sharded over the device
mesh.  All fields of :class:`NutsMachineState` are per-chain; ``vmap``
introduces the chains axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


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


class NutsMachineState(NamedTuple):
    """Complete per-chain state of the flattened NUTS state machine.

    One :func:`machine_step` advances every chain by exactly one leapfrog
    step; doubling/merge/draw-completion bookkeeping happens inline (masked)
    so chains never wait for each other at draw boundaries -- only at chunk
    boundaries ("Efficiently Vectorized MCMC on Modern Accelerators",
    arXiv:2503.17405, informs this design).
    """

    # --- persistent chain state ---
    rng_key: jax.Array
    position: jax.Array   # [dim] last accepted draw (unconstrained)
    gradient: jax.Array   # [dim]
    logp: jax.Array
    draw_idx: jax.Array   # global draw index currently being generated (i32)
    adapt: DiagAdaptState
    total_steps: jax.Array       # cumulative leapfrog count (i64-ish via f or i32)
    divergence_count: jax.Array  # i32
    done: jax.Array              # bool: finished this chunk

    # --- trajectory state (reset at each draw start) ---
    eps: jax.Array        # step size for this draw (after jitter)
    h0: jax.Array         # energy at trajectory start
    z_minus: jax.Array
    p_minus: jax.Array
    g_minus: jax.Array
    z_plus: jax.Array
    p_plus: jax.Array
    g_plus: jax.Array
    rho: jax.Array        # [dim] momentum sum over whole trajectory
    logw_traj: jax.Array  # log sum of multinomial weights of trajectory
    prop_z: jax.Array
    prop_g: jax.Array
    prop_logp: jax.Array
    prop_energy: jax.Array
    prop_idx: jax.Array   # signed index in trajectory (i32)
    depth: jax.Array      # current doubling index (subtree size 2^depth)
    direction: jax.Array  # +-1 (i32)
    left_idx: jax.Array   # absolute leaf index of left end (i32, <= 0)
    right_idx: jax.Array  # absolute leaf index of right end (i32, >= 0)
    sum_acc: jax.Array    # accumulated acceptance probabilities
    n_leaves: jax.Array   # leapfrog steps in this draw (i32)
    diverging: jax.Array  # bool

    # --- subtree state (reset at each doubling) ---
    n_leaf: jax.Array     # leaves completed in current subtree (i32)
    rho_sub: jax.Array    # [dim]
    logw_sub: jax.Array
    sprop_z: jax.Array
    sprop_g: jax.Array
    sprop_logp: jax.Array
    sprop_energy: jax.Array
    sprop_idx: jax.Array
    turning_sub: jax.Array  # bool
    ckpt_p: jax.Array     # [maxdepth, dim] momentum at checkpoint leaves
    ckpt_s: jax.Array     # [maxdepth, dim] momentum prefix-sum before ckpt leaf
    ckpt_top: jax.Array   # i32 stack pointer

    # --- divergence location info (last divergence in this chunk) ---
    div_start: jax.Array     # [dim] position where the diverging leapfrog began
    div_start_grad: jax.Array
    div_end: jax.Array       # [dim] position it produced
    div_mom: jax.Array       # [dim] momentum at divergence start


def tree_where(pred: jax.Array, a, b):
    """Select between two pytrees with a scalar/batched boolean."""
    def sel(x, y):
        p = pred
        x = jnp.asarray(x)
        if p.ndim:
            p = p.reshape(p.shape + (1,) * (x.ndim - p.ndim))
        return jnp.where(p, x, y)
    return jax.tree_util.tree_map(sel, a, b)
