"""Pallas machine-step megakernel: a whole chunk of draws per kernel call.

The standard runner (``run.make_chunk_runner``) drives ``machine_step``
through an XLA ``lax.while_loop``: every leapfrog step round-trips the packed
chain state (vecs/ckpt/flts/ints, ~45 KB/chain) and the draw buffers through
HBM.  At bench shape that traffic -- not FLOPs -- bounds per-sweep wall time
(``bench.py --roofline``).  This module instead runs the *entire chunk* inside
one Pallas kernel per chain tile: state, momentum randoms, and draw buffers
live in VMEM for the whole chunk and HBM is touched once on entry and once on
exit.  (VERDICT r2 item: "Pallas machine-step kernel with logp inlined";
the reference's abandoned analog is the TVM leapfrog experiment,
``/root/reference/benches/run_tvm_leapfrog.rs_old:1-40``.)

Design notes:
- The kernel body REUSES ``nuts.machine_step``/``start_draw`` verbatim --
  Pallas kernel bodies are traced JAX, so the state machine is written once.
  Everything it emits must lower in Mosaic, hence:
  - raw uint32[2] key data + ``ops/threefry.py`` instead of typed keys
    (bit-identical streams, tests/test_threefry.py),
  - ``row_write.force_mode("select")``: one-hot VMEM selects instead of
    batched scatters/gathers (cheap on VMEM-resident buffers),
  - the exponent-bit trailing-zero count in ``machine_step`` instead of
    ``lax.population_count``.
- Grid = chain tiles (``tile`` chains per program).  Each tile's while-loop
  exits at ITS OWN slowest chain, so straggler cost is paid per tile, not per
  fleet -- a tail benefit the monolithic XLA loop cannot express.
- The model logp must itself be Mosaic-lowerable (no gather/scatter): use
  e.g. ``models.radon(gather="onehot")``, where county lookups are matmuls.
- Scope = diag metric, exact-normal kinetic, no flow/low-rank/divergence-
  location buffers.  Both phases are covered: ``adapt_frozen=False``
  compiles the per-draw diag adaptation (Welford + dual averaging,
  elementwise) into the kernel, with cross-chain pooling and the
  trapped-chain rescue staying at XLA chunk boundaries.
- Measured verdict (results/mk_tpu_parity*.json, v5e): the kernel beats
  an unroll-MATCHED XLA runner 1.4-2.1x at every fleet size, but the
  production unroll-8 XLA runner is faster still at every size, so the
  kernel is OPT-IN (``NUTPIE_TPU_MEGAKERNEL=1``;
  sample.py:_maybe_megakernel_runner) -- a validated second
  implementation of the machine step (integer tree decisions exactly
  match the XLA runner) and the substrate for future fused-phase work.

``interpret=True`` runs the kernel through the Pallas interpreter (CPU), and
is compared bit-for-bit against the XLA runner in
``tests/test_megakernel.py``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..model import ModelDef
from ..ops import row_write
from ..ops.spellings import mosaic_spellings
from .adapt import Schedule
from .nuts import NutsConfig, init_buffers, machine_step, start_draw
from .state import NutsMachineState, state_with


def supports(cfg: NutsConfig) -> bool:
    """Whether the megakernel handles this configuration (v1 scope)."""
    return (
        cfg.flow is None
        and cfg.low_rank is None
        and cfg.kinetic != "microcanonical"
        and not cfg.store_divergences
        and not cfg.store_gradient
        and not cfg.store_mass_matrix
    )


def make_megakernel_chunk_runner(
    model: ModelDef,
    cfg: NutsConfig,
    chunk_len: int,
    dtype,
    tile: int = 64,
    unroll: int = 1,
    interpret: bool = False,
    pool_step_size: bool = False,
    adapt_frozen: bool = True,
    pool_mass_matrix: bool = False,
):
    """Build the jitted megakernel chunk runner.

    Same call signature and semantics as ``run.make_chunk_runner(...,
    flow_train=False)``: ``run_chunk(states, chunk_start, limit, sched) ->
    (states, bufs)``.  ``adapt_frozen=False`` compiles the per-draw diag
    adaptation (Welford mass-matrix accumulators + dual averaging --
    elementwise, VMEM-resident) INTO the kernel; the cross-chain stages
    (pooling collectives, trapped-chain rescue) stay in XLA at chunk
    boundaries, exactly as in ``run.make_chunk_runner``.
    """
    if not supports(cfg):
        raise ValueError("megakernel does not support this configuration")

    from jax.experimental import pallas as pl

    try:  # pltpu is importable on every backend; lowering needs TPU
        from jax.experimental.pallas import tpu as pltpu
    except ImportError:  # pragma: no cover
        pltpu = None

    # Hoist the model's captured data arrays (observations, design matrices,
    # ...) into explicit kernel operands: Pallas kernels may not close over
    # jax-array constants.  make_jaxpr surfaces them as ``consts``; array
    # consts become kernel inputs, everything else stays inlined.
    import numpy as _np

    example_x = jnp.zeros((model.ndim,), dtype)
    _closed = jax.make_jaxpr(lambda x: model.logp_and_grad(x))(example_x)
    _consts = list(_closed.consts)
    _hoist_idx = [
        i for i, c in enumerate(_consts)
        if isinstance(c, jax.Array) and c.ndim >= 1
    ]
    lg_consts = [_consts[i] for i in _hoist_idx]
    _static_consts = [
        None if i in set(_hoist_idx) else _np.asarray(c)
        for i, c in enumerate(_consts)
    ]
    n_consts = len(lg_consts)

    def lg_conv(x, *hoisted):
        cs = list(_static_consts)
        for pos, v in zip(_hoist_idx, hoisted):
            cs[pos] = v
        logp, grad = jax.core.eval_jaxpr(_closed.jaxpr, cs, x)
        return logp, grad

    def kernel(scal_ref, *refs, state_def=None, n_state=None,
               squeeze_idx=frozenset()):
        chunk_start = scal_ref[0]
        limit = scal_ref[1]
        sched = Schedule(
            num_tune=scal_ref[2],
            early_end=scal_ref[3],
            freeze_start=scal_ref[4],
            depth_cap=scal_ref[5],
        )
        const_refs = refs[:n_consts]
        refs = refs[n_consts:]
        state_refs = refs[:n_state]
        mom_ref, jit_ref = refs[n_state], refs[n_state + 1]
        out_state_refs = refs[n_state + 2 : 2 * n_state + 2]
        pos_ref, scalars_ref = refs[2 * n_state + 2], refs[2 * n_state + 3]

        const_vals = [r[:] for r in const_refs]

        def read_state(i, r):
            # rank-1 [chains] leaves travel as [chains, 1] (Pallas TPU
            # rejects rank-1 blocks smaller than the 128-lane tiling)
            v = r[:]
            return v[:, 0] if i in squeeze_idx else v

        def logp_and_grad(x, adapt):
            return lg_conv(x, *const_vals)

        with row_write.force_mode("select"), mosaic_spellings():
            state = jax.tree_util.tree_unflatten(
                state_def,
                [read_state(i, r) for i, r in enumerate(state_refs)],
            )
            mom = mom_ref[:]
            jit_u = jit_ref[:]
            dim = mom.shape[-1]
            bufs = init_buffers(cfg, chunk_len, dim, dtype, n_chains=tile)

            state = state_with(state, done=False)
            state = jax.vmap(partial(start_draw, cfg, sched))(
                state, mom[:, 0], jit_u[:, 0]
            )
            step = jax.vmap(
                partial(machine_step, cfg, logp_and_grad,
                        adapt_frozen=adapt_frozen),
                in_axes=(None, 0, 0, None, None, 0, 0),
            )

            def cond(carry):
                st, _ = carry
                # i32 reduce: Mosaic cannot lower i1-vector reductions
                from .state import INT_SLOTS as _I

                return jnp.min(st.ints[:, _I["done"]]) == 0

            def body(carry):
                st, bf = carry
                for _ in range(max(1, unroll)):
                    st, bf = step(
                        sched, mom, jit_u, chunk_start, limit, st, bf
                    )
                return st, bf

            state, bufs = jax.lax.while_loop(cond, body, (state, bufs))

        for i, (ref, leaf) in enumerate(zip(
            out_state_refs, jax.tree_util.tree_leaves(state)
        )):
            ref[:] = leaf[:, None] if i in squeeze_idx else leaf
        pos_ref[:] = bufs.position
        scalars_ref[:] = bufs.scalars

    def run_chunk(states: NutsMachineState, chunk_start, limit,
                  sched: Schedule):
        n_chains = states.done.shape[0]
        if n_chains % tile:
            raise ValueError(
                f"chains ({n_chains}) must be a multiple of tile ({tile})"
            )
        dim = states.position.shape[-1]

        if pool_step_size or pool_mass_matrix:
            # cross-chain pooling is a chunk-boundary collective; it runs in
            # XLA outside the kernel, exactly as in run.make_chunk_runner
            from .adapt import pool_adapt_state

            states = states._replace(adapt=pool_adapt_state(
                states.adapt, pool_mass=pool_mass_matrix,
                pool_step=pool_step_size,
            ))

        # raw key data: typed-key primitives do not lower in Mosaic
        raw = states._replace(
            rng_key=jax.vmap(jax.random.key_data)(states.rng_key)
        )
        leaves, state_def = jax.tree_util.tree_flatten(raw)
        # rank-1 [chains] leaves (per-chain adaptation scalars) travel as
        # [chains, 1]: Pallas TPU rejects rank-1 blocks below the 128-lane
        # tiling, while (tile, 1) rank-2 blocks lower everywhere
        squeeze_idx = frozenset(
            i for i, x in enumerate(leaves) if x.ndim == 1
        )
        leaves = [
            x[:, None] if i in squeeze_idx else x
            for i, x in enumerate(leaves)
        ]
        n_state = len(leaves)

        # per-draw randoms, identical streams to run.make_chunk_runner
        chunk_start = jnp.asarray(chunk_start, jnp.int32)
        limit = jnp.asarray(limit, jnp.int32)
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

        scal = jnp.stack(
            [
                chunk_start,
                limit,
                jnp.asarray(sched.num_tune, jnp.int32),
                jnp.asarray(sched.early_end, jnp.int32),
                jnp.asarray(sched.freeze_start, jnp.int32),
                jnp.asarray(sched.depth_cap, jnp.int32),
            ]
        )

        grid = (n_chains // tile,)

        def tile_spec_shape(shape):
            block = (tile,) + tuple(shape[1:])
            ndim = len(shape)

            def index_map(i):
                return (i,) + (0,) * (ndim - 1)

            kw = {}
            if pltpu is not None and not interpret:
                kw["memory_space"] = pltpu.VMEM
            return pl.BlockSpec(block, index_map, **kw)

        def tile_spec(leaf):
            return tile_spec_shape(leaf.shape)

        smem_kw = {}
        if pltpu is not None and not interpret:
            smem_kw["memory_space"] = pltpu.SMEM
        scal_spec = pl.BlockSpec(
            (6,), lambda i: (0,), **smem_kw
        )

        def const_spec(leaf):
            ndim = leaf.ndim
            kw = {}
            if pltpu is not None and not interpret:
                kw["memory_space"] = pltpu.VMEM
            return pl.BlockSpec(
                leaf.shape, lambda i, _n=ndim: (0,) * _n, **kw
            )

        in_specs = (
            [scal_spec]
            + [const_spec(x) for x in lg_consts]
            + [tile_spec(x) for x in leaves]
            + [tile_spec(mom_gauss), tile_spec(jitter_us)]
        )
        out_specs = (
            [tile_spec(x) for x in leaves]
            + [
                tile_spec_shape((n_chains, chunk_len, dim)),
                tile_spec_shape((n_chains, chunk_len, _n_scalar())),
            ]
        )
        out_shape = (
            [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in leaves]
            + [
                jax.ShapeDtypeStruct((n_chains, chunk_len, dim), dtype),
                jax.ShapeDtypeStruct(
                    (n_chains, chunk_len, _n_scalar()), dtype
                ),
            ]
        )

        import os as _os

        kw = {}
        if pltpu is not None and not interpret:
            # Scoped-VMEM budget derived from the actual per-tile residency
            # (state + randoms + draw buffers + hoisted consts), with 3x
            # headroom for Mosaic temporaries/double buffering, clamped to
            # [16MB, 120MB] (v5e has 128MB VMEM per core).  The default
            # 16MB is too small at production tile/chunk shapes;
            # NUTPIE_MK_VMEM_MB overrides.
            per_chain = sum(
                int(_np.prod(x.shape[1:])) * x.dtype.itemsize for x in leaves
            )
            per_chain += mom_gauss.dtype.itemsize * chunk_len * (dim + 1)
            buf_bytes = (
                jnp.dtype(dtype).itemsize * chunk_len * (dim + _n_scalar())
            )
            const_bytes = sum(
                int(_np.prod(c.shape)) * c.dtype.itemsize for c in lg_consts
            )
            # The limit is a BUDGET, not an allocation: Mosaic's measured
            # stack need GROWS with the budget it is given (68.4M need
            # against a 47.6M budget, 84.4M against 78.8M at tile 128 --
            # it spends headroom on buffering), so deriving a tight bound
            # from residency is self-defeating.  Default to near the v5e
            # physical 128M; the residency estimate only guards absurd
            # tile/chunk requests with a clear early error.
            need = tile * (2 * per_chain + buf_bytes) + const_bytes
            if need > (120 << 20):
                raise ValueError(
                    f"megakernel tile residency ~{need >> 20}MB exceeds "
                    f"VMEM; reduce tile ({tile}) or chunk ({chunk_len})"
                )
            env_mb = _os.environ.get("NUTPIE_MK_VMEM_MB")
            vmem = int(env_mb) * 1024 * 1024 if env_mb else 120 << 20
            kw["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=vmem,
            )
        outs = pl.pallas_call(
            partial(kernel, state_def=state_def, n_state=n_state,
                    squeeze_idx=squeeze_idx),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            debug=_os.environ.get("NUTPIE_MK_DEBUG", "") == "1",
            **kw,
        )(scal, *lg_consts, *leaves, mom_gauss, jitter_us)

        new_leaves = [
            o[:, 0] if i in squeeze_idx else o
            for i, o in enumerate(outs[:n_state])
        ]
        pos, scalars = outs[n_state], outs[n_state + 1]
        new_raw = jax.tree_util.tree_unflatten(state_def, new_leaves)
        new_states = new_raw._replace(
            rng_key=jax.vmap(jax.random.wrap_key_data)(new_raw.rng_key)
        )
        if not adapt_frozen:
            # cross-chain rescue collective, shared with the XLA runner
            from .run import rescue_trapped

            new_states = rescue_trapped(
                new_states, chunk_start, limit, sched
            )
        bufs = init_buffers(cfg, chunk_len, dim, dtype, n_chains=n_chains)
        bufs = bufs._replace(position=pos, scalars=scalars)
        return new_states, bufs

    return jax.jit(run_chunk)


def _n_scalar() -> int:
    from .nuts import N_SCALAR_SLOTS

    return N_SCALAR_SLOTS
