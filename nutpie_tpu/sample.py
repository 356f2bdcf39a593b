"""``sample()`` orchestration and the background sampler control plane.

API parity with the reference's ``nutpie.sample`` (``sample.py:823-977``):
the same signature, the (sampler, adaptation) -> settings mapping
(``sample.py:1015-1046``), kwargs forwarded as flat settings updates,
blocking and non-blocking modes with ``pause/resume/abort/cancel/inspect/
wait`` (``sample.py:481-725``), and KeyboardInterrupt -> abort.

Architecture: instead of the reference's Rust thread-per-chain sampler, a
single background Python thread drives the jitted device loop in chunks of
draws; control (pause/abort) and observation (progress, inspect) happen at
chunk boundaries.  ``cores`` is accepted for compatibility but has no
meaning on a TPU -- all chains run batched on the device mesh.
"""

from __future__ import annotations

import threading
import time
from typing import Any, Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import __version__ as _version
from .model import CompiledModel, ModelDef
from .progress import ChainProgress, make_progress_handlers
from .sampler.adapt import AdaptConfig, make_schedule
from .sampler.nuts import NutsConfig
from .sampler.run import init_chains, make_chunk_runner, resolve_dtype
from .settings import MclmcSettings, NutsSettings
from .trace import assemble_trace

__all__ = ["sample"]


def _make_settings(sampler: str, adaptation: str, seed):
    if sampler == "nuts":
        cls = NutsSettings
    elif sampler == "mclmc":
        cls = MclmcSettings
    else:
        raise ValueError(
            f"Unknown sampler '{sampler}'. Expected one of: 'nuts', 'mclmc'."
        )
    if adaptation == "low_rank":
        return cls.LowRank(seed)
    if adaptation == "flow":
        return cls.Flow(seed)
    if adaptation in ("diag", "draw_diag"):
        settings = cls.Diag(seed)
        if adaptation == "draw_diag":
            settings.use_grad_based_mass_matrix = False
        return settings
    raise ValueError(
        f"Unknown adaptation strategy '{adaptation}'. "
        f"Expected one of: 'diag', 'draw_diag', 'low_rank', 'flow'."
    )


def _apply_f32_flow_recipe(args: dict, precision: str) -> None:
    """Default flow training to the measured f32-stable recipe.

    Fisher-divergence training is numerically harder in float32: on the
    nested hierarchical funnel the x64 recipe (lr 1e-3, 400 steps) that
    passes the CPU gate leaves 35 posterior divergences / fisher ~0.56 on
    TPU f32, while lr 3e-4 x 1600 steps brings that to 2 divergences /
    fisher 0.16 (hardware sweep, results/README.md round 4).  Apply the
    gentler recipe as the DEFAULT whenever the run resolves to float32;
    values the user set explicitly (settings tree or with_transform_adapt)
    always win.
    """
    from .sampler.run import resolve_dtype

    if resolve_dtype(precision) == jnp.float32:
        args.setdefault("learning_rate", 3e-4)
        args.setdefault("train_steps", 1600)
        args.setdefault("lr_decay", True)


def _nuts_config_from_settings(
    settings: NutsSettings, transform_args: Optional[dict] = None
) -> NutsConfig:
    import dataclasses as _dc

    from .sampler.nuts import LowRankConfig
    from .transforms.flow import FlowConfig

    ss = settings.adapt_options.step_size_settings
    mm = getattr(settings.adapt_options, "mass_matrix_options", None)
    low_rank = None
    flow = None
    if settings.adaptation == "low_rank":
        low_rank = LowRankConfig(
            eigval_cutoff=getattr(mm, "eigval_cutoff", 100.0),
            gamma=getattr(mm, "gamma", 1e-5),
            window=getattr(settings.adapt_options, "mass_matrix_switch_freq", 80),
        )
    elif settings.adaptation == "flow":
        args = dict(getattr(settings.adapt_options, "flow", {}) or {})
        args.update(transform_args or {})
        freq = getattr(settings.adapt_options, "transform_update_freq", 64)
        known = {f.name for f in _dc.fields(FlowConfig)}
        args.setdefault(
            "use_orbit",
            getattr(settings.adapt_options, "use_orbit_for_training", False),
        )
        _apply_f32_flow_recipe(args, settings.precision)
        flow = FlowConfig(
            update_freq=freq,
            **{k: v for k, v in args.items() if k in known},
        )
    adapt = AdaptConfig(
        num_tune=settings.num_tune,
        target_accept=ss.target_accept,
        initial_step=ss.initial_step,
        gamma=ss.adapt_options.dual_average.gamma,
        t0=ss.adapt_options.dual_average.t0,
        kappa=ss.adapt_options.dual_average.kappa,
        max_step_size=ss.adapt_options.dual_average.max_step_size,
        method=ss.adapt_options.method,
        adam_lr=ss.adapt_options.adam.learning_rate,
        adam_beta1=ss.adapt_options.adam.beta1,
        adam_beta2=ss.adapt_options.adam.beta2,
        step_size_jitter=ss.jitter,
        switch_freq=getattr(settings.adapt_options, "mass_matrix_switch_freq", 80),
        early_switch_freq=getattr(
            settings.adapt_options, "early_mass_matrix_switch_freq", 10
        ),
        early_phase_share=getattr(settings.adapt_options, "early_phase_share", 0.3),
        freeze_share=getattr(settings.adapt_options, "freeze_share", 0.1),
        use_grad_based_estimate=getattr(mm, "use_grad_based_estimate", True),
        update_mass_matrix=flow is None,
    )
    return NutsConfig(
        maxdepth=settings.maxdepth,
        mindepth=settings.mindepth,
        check_turning=settings.check_turning,
        kinetic=settings.trajectory_kind,
        target_time=settings.target_integration_time,
        extra_doublings=settings.extra_doublings,
        max_energy_error=settings.max_energy_error,
        store_gradient=settings.store_gradient,
        store_mass_matrix=getattr(mm, "store_mass_matrix", False),
        store_divergences=settings.store_divergences,
        store_transformed=settings.store_transformed,
        low_rank=low_rank,
        flow=flow,
        adapt=adapt,
    )


# (model identity, config, chunk shape) -> jitted chunk runner.  jax's jit
# cache is keyed on function identity, so without this every sample() call
# would re-trace and re-compile the machine even for identical configs.
_RUNNER_CACHE: dict = {}


def _maybe_megakernel_runner(model: ModelDef, cfg: NutsConfig,
                             chunk_len: int, dtype, n_chains: int,
                             pool_step: bool, fallback):
    """Opt-in Pallas megakernel for post-warmup chunks.

    Measured verdict (TPU v5e, radon, ``results/mk_tpu_parity*.json``):
    the VMEM-resident kernel beats an UNROLL-MATCHED XLA runner 1.4-2.1x
    at every fleet size, but the production unroll-8 XLA runner is faster
    still (posterior grads/s: XLA-u8 4.33M/5.40M/4.34M at 512/1024/2048
    chains vs the kernel's 2.17M/3.02M/3.51M) -- in-kernel unrolling does
    not help (VMEM residency already removed the traffic the unroll
    amortizes), so the kernel currently never wins on this hardware and
    is NOT auto-selected.  ``NUTPIE_TPU_MEGAKERNEL=1`` opts in (verified
    end-to-end: results/mk_auto_smoke_r4.json -- statistically identical
    draws); the integer tree decisions match the XLA runner exactly, so
    the kernel remains a validated second implementation of the machine
    step and the substrate for future fused-phase work.  Mosaic compile
    failures (e.g. batched gathers in the model logp) fall back to the
    XLA runner at runtime.
    """
    import os

    flag = os.environ.get("NUTPIE_TPU_MEGAKERNEL", "0")
    if flag != "1":
        return fallback
    try:
        if jax.default_backend() != "tpu":
            return fallback
    except Exception:
        return fallback
    from .sampler import megakernel

    if not megakernel.supports(cfg):
        return fallback
    tile = next(
        (t for t in (128, 64, 32, 16, 8) if n_chains % t == 0), None
    )
    if tile is None:
        return fallback
    try:
        mk = megakernel.make_megakernel_chunk_runner(
            model, cfg, chunk_len, dtype, tile=min(tile, n_chains),
            pool_step_size=pool_step,
        )
    except Exception:
        return fallback
    status = {"failed": False}

    def run(states, start, limit, sched):
        if status["failed"]:
            return fallback(states, start, limit, sched)
        try:
            return mk(states, start, limit, sched)
        except Exception:
            # Mosaic compile/runtime failure: the kernel never executed
            # (jit compiles before running), so `states` is intact for the
            # XLA runner
            status["failed"] = True
            return fallback(states, start, limit, sched)

    return run


def _cached_chunk_runner(model: ModelDef, cfg: NutsConfig, chunk_len: int,
                         dtype, n_chains: int, pool: bool,
                         flow_train: bool = True, adapt_frozen: bool = False,
                         pool_step: bool = False):
    import weakref

    key = (
        id(model), cfg, chunk_len, jnp.dtype(dtype).name, n_chains, pool,
        flow_train, adapt_frozen, pool_step,
    )
    hit = _RUNNER_CACHE.get(key)
    if hit is not None:
        ref, runner = hit
        if ref() is model:
            return runner
    unroll = 1
    try:
        if jax.default_backend() == "tpu":
            unroll = 8  # amortizes while-loop bookkeeping (swept: 8 > 4 > 1 on TPU)
    except Exception:
        pass
    runner = make_chunk_runner(
        model, cfg, chunk_len, dtype, pool_mass_matrix=pool,
        flow_train=flow_train, unroll=unroll, adapt_frozen=adapt_frozen,
        pool_step_size=pool_step,
    )
    if len(_RUNNER_CACHE) > 64:
        _RUNNER_CACHE.clear()
    _RUNNER_CACHE[key] = (weakref.ref(model), runner)
    return runner


_INIT_CACHE: dict = {}


def _cached_init_fn(model: ModelDef, cfg, dtype, num_try_init: int):
    import weakref

    from .sampler.run import make_init_fn

    key = (id(model), cfg, jnp.dtype(dtype).name, num_try_init)
    hit = _INIT_CACHE.get(key)
    if hit is not None:
        ref, fn = hit
        if ref() is model:
            return fn
    fn = make_init_fn(model, cfg, dtype, num_try_init)
    if len(_INIT_CACHE) > 64:
        _INIT_CACHE.clear()
    _INIT_CACHE[key] = (weakref.ref(model), fn)
    return fn


def _mclmc_config_from_settings(
    settings: MclmcSettings, transform_args: Optional[dict] = None
) -> "MclmcConfig":
    import dataclasses as _dc

    from .sampler.mclmc import MclmcConfig
    from .sampler.nuts import LowRankConfig
    from .transforms.flow import FlowConfig

    ss = settings.adapt_options.step_size_settings
    mm = getattr(settings.adapt_options, "mass_matrix_options", None)
    low_rank = None
    flow = None
    if settings.adaptation == "low_rank":
        low_rank = LowRankConfig(
            eigval_cutoff=getattr(mm, "eigval_cutoff", 100.0),
            gamma=getattr(mm, "gamma", 1e-5),
            window=getattr(settings.adapt_options, "mass_matrix_switch_freq", 80),
        )
    elif settings.adaptation == "flow":
        args = dict(getattr(settings.adapt_options, "flow", {}) or {})
        args.update(transform_args or {})
        freq = getattr(settings.adapt_options, "transform_update_freq", 64)
        known = {f.name for f in _dc.fields(FlowConfig)}
        _apply_f32_flow_recipe(args, settings.precision)
        flow = FlowConfig(
            update_freq=freq,
            **{k: v for k, v in args.items() if k in known},
        )
    adapt = AdaptConfig(
        num_tune=settings.num_tune,
        switch_freq=getattr(settings.adapt_options, "mass_matrix_switch_freq", 80),
        early_switch_freq=getattr(
            settings.adapt_options, "early_mass_matrix_switch_freq", 10
        ),
        use_grad_based_estimate=getattr(mm, "use_grad_based_estimate", True),
        target_accept=ss.target_accept,
        initial_step=ss.initial_step,
        update_mass_matrix=flow is None,
    )
    return MclmcConfig(
        step_size=settings.step_size,
        momentum_decoherence_length=settings.momentum_decoherence_length,
        steps_per_draw=max(1, int(round(settings.subsample_frequency))),
        dynamic_step_size=settings.dynamic_step_size,
        max_energy_error=settings.max_energy_error,
        trajectory=settings.trajectory_kind,
        store_gradient=settings.store_gradient,
        store_mass_matrix=getattr(mm, "store_mass_matrix", False),
        low_rank=low_rank,
        flow=flow,
        adapt=adapt,
    )


def _default_chunk_size(settings, n_chains: int, dim: int, itemsize: int) -> int:
    if settings.chunk_size is not None:
        return max(1, int(settings.chunk_size))
    n_vec_buffers = 1 + settings.store_gradient + 4 * settings.store_divergences
    mm = getattr(settings.adapt_options, "mass_matrix_options", None)
    n_vec_buffers += bool(getattr(mm, "store_mass_matrix", False))
    bytes_per_draw = n_chains * (dim * itemsize * n_vec_buffers + 128)
    target_bytes = 256 * 1024 * 1024
    cap = 128
    try:
        if jax.default_backend() == "tpu":
            # buffer writes cost O(chunk) per leapfrog on TPU (select-based
            # masked writes); short chunks keep the sampler compute-bound
            cap = 32
    except Exception:
        pass
    return int(np.clip(target_bytes // max(bytes_per_draw, 1), 8, cap))


class _BackgroundSampler:
    """Drives the chunked device loop in a background thread."""

    def __init__(
        self,
        compiled_model: CompiledModel,
        settings,
        init_mean,
        cores=None,
        *,
        progress_bar: bool = True,
        progress_callback=None,
        save_warmup: bool = True,
        return_raw_trace: bool = False,
        progress_template=None,
        progress_style=None,
        progress_rate: int = 100,
        store=None,
        store_unconstrained: bool = False,
        checkpoint=None,
        checkpoint_every: int = 1,
        resume_from=None,
    ):
        self._checkpoint_path = checkpoint
        self._checkpoint_every = max(1, int(checkpoint_every))
        self._resume_from = resume_from
        self._resume_offset = 0
        self._kind = "mclmc" if isinstance(settings, MclmcSettings) else "nuts"
        self._compiled_model = compiled_model
        self._settings = settings
        self._save_warmup = save_warmup
        self._return_raw_trace = return_raw_trace
        self._store_unconstrained = store_unconstrained
        self._zarr_store = store

        seed = settings.seed
        if seed is None:
            seed = int(np.random.default_rng().integers(0, 2**63 - 1))
            settings.seed = seed
        self._seed = int(seed)

        self._model: ModelDef = compiled_model._make_model(self._seed)
        if self._kind == "mclmc":
            self._cfg = _mclmc_config_from_settings(
                settings, getattr(compiled_model, "_transform_adapt_args", None)
            )
        else:
            self._cfg = _nuts_config_from_settings(
                settings, getattr(compiled_model, "_transform_adapt_args", None)
            )
        self._dtype = resolve_dtype(settings.precision)
        self._n_chains = settings.num_chains
        self._num_tune = settings.num_tune
        self._num_draws = settings.num_draws
        self._total = self._num_tune + self._num_draws
        if init_mean is None:
            init_mean = np.zeros(self._model.ndim)
        self._init_mean = np.asarray(init_mean)

        itemsize = jnp.dtype(self._dtype).itemsize
        self._chunk_len = min(
            _default_chunk_size(settings, self._n_chains, self._model.ndim, itemsize),
            max(self._total, 1),
        )
        if settings.adaptation == "low_rank" and settings.chunk_size is None:
            # align chunk boundaries with the mass-matrix switch cadence so
            # the low-rank factor updates happen at the reference's schedule
            freq = getattr(settings.adapt_options, "mass_matrix_switch_freq", 80)
            self._chunk_len = min(max(freq, 1), max(self._total, 1))
        if settings.adaptation == "flow" and settings.chunk_size is None:
            # chunk boundaries are where flows train
            freq = getattr(settings.adapt_options, "transform_update_freq", 64)
            self._chunk_len = min(max(freq, 1), max(self._total, 1))

        self._handlers = make_progress_handlers(
            progress_bar, progress_callback, progress_rate,
            progress_template, progress_style,
        )

        # control state
        self._pause_evt = threading.Event()
        self._abort_evt = threading.Event()
        self._finished_evt = threading.Event()
        self._lock = threading.Lock()
        self._chunks: list[dict[str, np.ndarray]] = []
        self._draws_done = 0
        self._error: Optional[BaseException] = None
        self._progress: list[ChainProgress] = []
        self._start_time = time.monotonic()
        # first-K divergent draw indices per chain (total counts live in
        # ChainProgress.divergences); unbounded accumulation at 2048 chains
        # x heavy divergence counts is real host memory/CPU, and renderers
        # only ever show a handful (reference caps render work in Rust)
        self._divergent_draws: list[list[int]] = [[] for _ in range(self._n_chains)]
        self._max_divergent_draws = 100

        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------- device loop

    def _run(self) -> None:
        try:
            # HMC energies need accurate log densities: TPU matmuls default
            # to bf16 truncation, which injects O(1) energy noise into large
            # models (collapsing step sizes / spurious divergences), so all
            # sampler tracing happens under full-precision matmuls.
            with jax.default_matmul_precision("highest"):
                self._run_inner()
        except BaseException as err:  # surfaced in wait()
            self._error = err
        finally:
            self._finished_evt.set()
            for h in self._handlers:
                try:
                    h.finalize(self._progress)
                except Exception:
                    pass

    def _run_inner(self) -> None:
        model, cfg, dtype = self._model, self._cfg, self._dtype
        if self._kind == "mclmc":
            from .sampler.mclmc import (
                init_mclmc_chains,
                make_mclmc_chunk_runner,
            )

            states, ok = init_mclmc_chains(
                model, cfg, self._seed, self._n_chains, self._init_mean,
                dtype, num_try_init=self._settings.num_try_init,
            )
        else:
            states, ok = init_chains(
                model, cfg, self._seed, self._n_chains, self._init_mean,
                dtype, num_try_init=self._settings.num_try_init,
                init_fn=_cached_init_fn(
                    model, cfg, dtype, self._settings.num_try_init
                ),
            )
        ok = np.asarray(ok)
        if not ok.all():
            bad = int((~ok).sum())
            raise RuntimeError(
                f"Logp function returned error for initial positions of "
                f"{bad} chains (tried {self._settings.num_try_init} points "
                f"per chain)"
            )
        from .parallel import shard_chains

        states = shard_chains(states)
        if self._kind == "mclmc":
            runner = make_mclmc_chunk_runner(
                model, cfg, self._chunk_len, dtype
            )
            runner_sampling = runner
        else:
            runner = _cached_chunk_runner(
                model, cfg, self._chunk_len, dtype, self._n_chains,
                self._settings.pool_mass_matrix, flow_train=True,
                pool_step=getattr(self._settings, "pool_step_size", False),
            )
            # frozen variant for post-warmup chunks: no flow training and no
            # per-draw adaptation update compiled in
            runner_sampling = _cached_chunk_runner(
                model, cfg, self._chunk_len, dtype, self._n_chains,
                self._settings.pool_mass_matrix, flow_train=False,
                pool_step=getattr(self._settings, "pool_step_size", False),
                adapt_frozen=True,
            )
            runner_sampling = _maybe_megakernel_runner(
                model, cfg, self._chunk_len, dtype, self._n_chains,
                pool_step=getattr(self._settings, "pool_step_size", False),
                fallback=runner_sampling,
            )
        if model.expand_needs_rng:
            # per-(chain, draw) keys so generated-quantities RNG is
            # deterministic and chain/draw-independent (the reference gives
            # each chain its own Stan RNG, src/stan.rs:787-796)
            _ex = jax.jit(jax.vmap(jax.vmap(model.expand_fn)))
            gq_master = jax.random.key(self._seed ^ 0x6A09E667)

            def expand(positions, chunk_start):
                C, L = positions.shape[:2]
                ckeys = jax.vmap(
                    lambda c: jax.random.fold_in(gq_master, c)
                )(jnp.arange(C))
                dkeys = jax.vmap(
                    lambda ck: jax.vmap(
                        lambda d: jax.random.fold_in(ck, d)
                    )(chunk_start + jnp.arange(L))
                )(ckeys)
                return _ex(positions, dkeys)

        else:
            _ex = jax.jit(jax.vmap(jax.vmap(model.expand_fn)))

            def expand(positions, chunk_start):
                return _ex(positions)

        # resume BEFORE building the zarr sink: the sink's layout appends
        # from the resumed draw offset (offset-aligned; trailing partial
        # chunks are read back from the store and re-buffered)
        start = 0
        ckpt_meta = {"seed": self._seed, "settings": self._settings.as_dict()}
        if self._resume_from is not None:
            from .checkpoint import load_state

            states, start, meta = load_state(self._resume_from, states)
            self._resume_offset = start
            if meta.get("seed") != self._seed:
                import warnings

                warnings.warn(
                    "resuming a run that was started with a different seed",
                    stacklevel=2,
                )

        sink = None
        if self._zarr_store is not None:
            from .storage.sink import ZarrTraceSink

            sink = ZarrTraceSink(
                self._zarr_store,
                n_chains=self._n_chains,
                num_tune=self._num_tune,
                num_draws=self._num_draws,
                save_warmup=self._save_warmup,
                chunk_draws=min(16, self._chunk_len),
                start_offset=self._resume_offset,
                attrs={
                    "inference_library": "nutpie_tpu",
                    "inference_library_version": _version,
                    "inference_library_settings": self._settings.as_json(),
                },
            )
            sink_dims = {
                v.name: tuple(v.dims or ())
                for v in model.expanded_variables
            }
            sink_coords = dict(model.coords)
            sink_coords["unconstrained_parameter"] = np.asarray(
                model.unconstrained_labels, dtype=object
            )

        chunk_idx = 0
        prev_n_steps = None
        is_mclmc = self._kind == "mclmc"
        # fleet-relative work cap (NUTS only); before the first fleet
        # measurement exists, a static initial cap bounds the maxdepth-tree
        # straggler tax of the first chunk (NutsConfig.initial_depth_cap).
        # The Schedule is built ONCE and only its depth_cap field is
        # swapped (a device scalar): rebuilding it per chunk issues fresh
        # host->device puts whose tunnel round trips dominate warmup wall
        # on remote topologies.
        sched_live = make_schedule(
            cfg.adapt, self._num_tune,
            cfg.initial_depth_cap
            if not is_mclmc and self._n_chains >= 64 else None,
        )

        def _progress_snapshot(st):
            # small device copies that survive donation of the full state
            import types

            snap = types.SimpleNamespace(
                draw_idx=jnp.array(st.draw_idx, copy=True),
                divergence_count=jnp.array(st.divergence_count, copy=True),
                total_steps=jnp.array(st.total_steps, copy=True),
            )
            if hasattr(st, "eps"):
                snap.eps = jnp.array(st.eps, copy=True)
            else:
                snap.log_eps = jnp.array(st.log_eps, copy=True)
            return snap

        # double-buffered loop: the device computes chunk k+1 while the host
        # converts/stores chunk k (device->host transfer overlaps sampling)
        pending = None  # (bufs, start, limit, progress_snapshot)
        while (
            start < self._total and not self._abort_evt.is_set()
        ) or pending is not None:
            launched = None
            if start < self._total and not self._abort_evt.is_set():
                while self._pause_evt.is_set():
                    if self._abort_evt.is_set():
                        break
                    time.sleep(0.01)
                if not self._abort_evt.is_set():
                    if (
                        self._checkpoint_path is not None
                        and chunk_idx > 0
                        and chunk_idx % self._checkpoint_every == 0
                    ):
                        # states corresponds exactly to `start` draws and is
                        # about to be donated to the next chunk: save now
                        from .checkpoint import save_state

                        save_state(
                            self._checkpoint_path, states, start, ckpt_meta
                        )
                    limit = min(self._chunk_len, self._total - start)
                    active_runner = (
                        runner if start < self._num_tune else runner_sampling
                    )
                    states, bufs = active_runner(
                        states, start, limit, sched_live,
                    )
                    # fleet-relative work cap for the NEXT chunk, frozen at
                    # the mass-matrix freeze point (run.fleet_depth_cap).
                    # Needs an actual fleet: with few chains the median is
                    # noise and capping outliers just truncates honest deep
                    # trees (the 2-chain 100-d funnel gate needs depth 7-9)
                    if (
                        not is_mclmc
                        and self._n_chains >= 64
                        and start + limit
                        <= self._num_tune
                        - int(cfg.adapt.freeze_share * self._num_tune)
                    ):
                        from .sampler.run import fleet_depth_cap

                        sched_live = sched_live._replace(
                            depth_cap=fleet_depth_cap(cfg, bufs, limit)
                        )
                    snap = _progress_snapshot(states)
                    jax.tree_util.tree_map(
                        lambda a: a.copy_to_host_async()
                        if hasattr(a, "copy_to_host_async") else None,
                        bufs,
                    )
                    launched = (bufs, start, limit, snap)
                    start += limit
                    chunk_idx += 1
            if pending is not None:
                p_bufs, p_start, p_limit, p_snap = pending
                expanded = expand(p_bufs.position, p_start)
                chunk = self._chunk_to_host(p_bufs, expanded, p_limit)
                with self._lock:
                    # zarr runs stream to the store and return a
                    # store-backed trace; holding every chunk in host
                    # memory as well would defeat streaming at 10k+ chains
                    # (reference reopens the store, sample.py:615-627)
                    if sink is None or self._return_raw_trace:
                        self._chunks.append(chunk)
                    self._draws_done = p_start + p_limit
                    div_rows = chunk["stats"]["diverging"]
                    for c in range(self._n_chains):
                        room = self._max_divergent_draws - len(
                            self._divergent_draws[c]
                        )
                        if room <= 0:
                            continue
                        idxs = np.nonzero(div_rows[c])[0] + p_start
                        self._divergent_draws[c].extend(
                            int(i) for i in idxs[:room]
                        )
                if sink is not None:
                    sink.append_chunk(chunk, p_start, sink_dims, sink_coords)
                prev_n_steps = chunk["stats"]["n_steps"]
                self._update_progress(p_snap, prev_n_steps, p_start + p_limit)
            pending = launched
        if self._checkpoint_path is not None and self._draws_done > 0:
            from .checkpoint import save_state

            save_state(
                self._checkpoint_path, states, self._draws_done, ckpt_meta
            )
        if sink is not None:
            sink.finalize(self._draws_done)

    _SCALAR_DTYPES = {
        "depth": np.int32,
        "n_steps": np.int32,
        "index_in_trajectory": np.int32,
        "maxdepth_reached": bool,
        "diverging": bool,
    }

    def _chunk_to_host(self, bufs, expanded, limit: int) -> dict:
        def cut(x):
            return np.asarray(x)[:, :limit]

        stats = {}
        for name, value in bufs._asdict().items():
            if value is None or name in ("position", "scalars"):
                continue
            if name == "gradient" and not self._settings.store_gradient:
                continue  # allocated for adaptation, not requested by user
            arr = cut(value)
            if name in ("diverging", "maxdepth_reached"):
                arr = arr.astype(bool)
            stats[name] = arr
        if hasattr(bufs, "scalars"):
            from .sampler.nuts import SCALAR_SLOTS

            packed = cut(bufs.scalars)
            is_flow = getattr(self._cfg, "flow", None) is not None
            for name, slot in SCALAR_SLOTS.items():
                if name == "fisher_distance" and not is_flow:
                    continue
                arr = packed[..., slot]
                dt = self._SCALAR_DTYPES.get(name)
                if dt is bool:
                    arr = arr > 0.5
                elif dt is not None:
                    arr = arr.astype(dt)
                stats[name] = arr
        if "mass_matrix_inv" in stats:
            stats["mass_matrix_stds"] = np.sqrt(stats["mass_matrix_inv"])
        if "divergence_start" in stats:
            # reference parity: a human-readable message column
            msg = np.where(
                stats["diverging"],
                "energy error exceeded max_energy_error (or was non-finite)",
                "",
            )
            stats["divergence_message"] = msg.astype(object)
        if self._store_unconstrained:
            stats["unconstrained_draw"] = cut(bufs.position)
        return {
            "position": cut(bufs.position),
            "stats": stats,
            "expanded": {k: cut(v) for k, v in expanded.items()},
        }

    def _update_progress(self, states, last_n_steps, finished: int) -> None:
        draw_idx = np.asarray(states.draw_idx)
        divergences = np.asarray(states.divergence_count)
        total_steps = np.asarray(states.total_steps)
        if hasattr(states, "eps"):
            eps = np.asarray(states.eps)
        else:
            eps = np.exp(np.asarray(states.log_eps))
        runtime_ms = (time.monotonic() - self._start_time) * 1000.0
        progress = []
        for c in range(self._n_chains):
            latest = int(last_n_steps[c, -1]) if last_n_steps is not None else 0
            progress.append(
                ChainProgress(
                    chain_index=c,
                    finished_draws=int(min(draw_idx[c], self._total)),
                    total_draws=self._total,
                    divergences=int(divergences[c]),
                    tuning=bool(draw_idx[c] < self._num_tune),
                    started=True,
                    finished=bool(draw_idx[c] >= self._total),
                    latest_num_steps=latest,
                    total_num_steps=int(total_steps[c]),
                    step_size=float(eps[c]),
                    runtime_ms=runtime_ms,
                    divergent_draws=list(self._divergent_draws[c]),
                )
            )
        self._progress = progress
        for h in self._handlers:
            h.update(progress)

    # --------------------------------------------------------------- assembly

    def _collect(self) -> Optional[dict]:
        with self._lock:
            if not self._chunks:
                return None
            chunks = list(self._chunks)
        out = {
            "position": np.concatenate([c["position"] for c in chunks], axis=1),
            "stats": {
                k: np.concatenate([c["stats"][k] for c in chunks], axis=1)
                for k in chunks[0]["stats"]
            },
            "expanded": {
                k: np.concatenate([c["expanded"][k] for c in chunks], axis=1)
                for k in chunks[0]["expanded"]
            },
        }
        return out

    def _extract(self, raw: Optional[dict]):
        if self._return_raw_trace and raw is not None:
            return raw
        if self._zarr_store is not None and not self._return_raw_trace:
            # store-backed trace (reference parity: zarr runs reopen the
            # store read-only instead of materializing draws on the host,
            # sample.py:615-627); arrays load lazily on access
            if self._draws_done > 0:
                from .trace import open_zarr_trace

                return open_zarr_trace(self._zarr_store)
        if raw is None:
            raise RuntimeError("No draws were produced")
        model = self._model
        dims_map: dict[str, tuple[str, ...]] = {}
        for v in model.expanded_variables:
            dims_map[v.name] = tuple(v.dims or ())
        coords = dict(model.coords)
        coords.update(self._compiled_model.coords)
        coords["unconstrained_parameter"] = np.asarray(
            model.unconstrained_labels, dtype=object
        )
        unconstrained = None
        if self._store_unconstrained:
            unconstrained = {}
            for v in model.param_variables:
                arr = raw["position"][:, :, v.start_idx : v.end_idx]
                arr = arr.reshape(arr.shape[:2] + v.shape)
                unconstrained[v.name] = arr
                dims_map.setdefault(v.name, tuple(v.dims or ()))
        attrs = {
            "inference_library": "nutpie_tpu",
            "inference_library_version": _version,
            "inference_library_settings": self._settings.as_json(),
        }
        return assemble_trace(
            expanded=raw["expanded"],
            stats=raw["stats"],
            unconstrained=unconstrained,
            num_tune=max(0, self._num_tune - self._resume_offset),
            save_warmup=self._save_warmup,
            dims_map=dims_map,
            coords=coords,
            attrs=attrs,
            reparameterized_names=tuple(model.reparameterized_names),
        )

    # ---------------------------------------------------------------- control

    def wait(self, timeout: Optional[float] = None):
        """Block until sampling finishes and return the trace.

        Raises ``TimeoutError`` if ``timeout`` (seconds) elapses first
        (reference ``wrapper.rs:1108-1122``).
        """
        self._finished_evt.wait(timeout)
        if not self._finished_evt.is_set():
            raise TimeoutError("Sampling did not finish within the timeout")
        self._thread.join()
        if self._error is not None:
            raise self._error
        return self._extract(self._collect())

    def pause(self):
        """Pause the sampler (at the next chunk boundary)."""
        self._pause_evt.set()

    def resume(self):
        """Resume a paused sampler."""
        self._pause_evt.clear()

    def abort(self):
        """Abort sampling and return the partial trace (None if no draws)."""
        self._abort_evt.set()
        self._pause_evt.clear()
        self._thread.join()
        if self._error is not None:
            raise self._error
        raw = self._collect()
        if raw is None and (self._zarr_store is None or self._draws_done == 0):
            return None
        return self._extract(raw)

    def cancel(self):
        """Abort sampling and discard all draws."""
        self._abort_evt.set()
        self._pause_evt.clear()
        self._thread.join()

    def inspect(self):
        """Snapshot the current partial trace while sampling continues."""
        return self._extract(self._collect())

    @property
    def is_finished(self) -> bool:
        return self._finished_evt.is_set()

    def __del__(self):
        try:
            self._abort_evt.set()
            self._pause_evt.clear()
        except Exception:
            pass


def sample(
    compiled_model: CompiledModel,
    *,
    draws: Optional[int] = None,
    tune: Optional[int] = None,
    chains: Optional[int] = None,
    cores: Optional[int] = None,
    seed: Optional[int] = None,
    save_warmup: bool = True,
    progress_bar: bool = True,
    sampler: Literal["nuts", "mclmc"] = "nuts",
    adaptation: Literal["diag", "draw_diag", "low_rank", "flow"] = "diag",
    init_mean: Optional[np.ndarray] = None,
    return_raw_trace: bool = False,
    blocking: bool = True,
    progress_callback: Any = None,
    progress_template: Optional[str] = None,
    progress_style: Optional[str] = None,
    progress_rate: int = 100,
    zarr_store: Any = None,
    store_unconstrained: bool = False,
    checkpoint: Any = None,
    checkpoint_every: int = 1,
    resume_from: Any = None,
    **kwargs,
):
    """Sample the posterior distribution for a compiled model.

    Signature and semantics mirror the reference's ``nutpie.sample``
    (``python/nutpie/sample.py:823-977``); see that docstring for parameter
    details.  Differences on TPU: ``cores`` is ignored (chains run batched
    on the device mesh); extra keyword settings include ``precision``,
    ``chunk_size`` and ``pool_mass_matrix``; and ``checkpoint``/
    ``checkpoint_every``/``resume_from`` provide durable checkpoint-restart
    of a run (chain + adaptation + RNG state snapshots, a capability the
    reference lacks).
    """
    # Backward-compatible deprecated keyword arguments, matching the
    # reference's shims (``/root/reference/python/nutpie/sample.py:979-1013``).
    import warnings as _warnings

    updates = dict(kwargs)
    for _old_name, _new_adaptation in [
        ("low_rank_modified_mass_matrix", "low_rank"),
        ("transform_adapt", "flow"),
    ]:
        if _old_name in updates:
            _val = updates.pop(_old_name)
            if _val:
                _warnings.warn(
                    f"`{_old_name}` is deprecated. "
                    f"Use `adaptation='{_new_adaptation}'` instead.",
                    FutureWarning,
                    stacklevel=2,
                )
                if adaptation != "diag":
                    raise ValueError(
                        f"`{_old_name}` is deprecated and cannot be "
                        f"combined with the `adaptation` argument."
                    )
                adaptation = _new_adaptation
    if "use_grad_based_mass_matrix" in updates:
        _warnings.warn(
            "`use_grad_based_mass_matrix` is deprecated. "
            "Use `adaptation='draw_diag'` instead of "
            "`use_grad_based_mass_matrix=False`.",
            FutureWarning,
            stacklevel=2,
        )
        if not updates.pop("use_grad_based_mass_matrix"):
            if adaptation not in ("diag", "draw_diag"):
                raise ValueError(
                    "`use_grad_based_mass_matrix=False` requires diag "
                    "adaptation"
                )
            adaptation = "draw_diag"

    settings = _make_settings(sampler, adaptation, seed)
    if tune is not None:
        updates["num_tune"] = tune
    if draws is not None:
        updates["num_draws"] = draws
    if chains is not None:
        updates["num_chains"] = chains
    settings.update(updates)
    if store_unconstrained:
        settings.store_unconstrained = True

    background = _BackgroundSampler(
        compiled_model,
        settings,
        init_mean,
        cores,
        progress_bar=progress_bar,
        progress_callback=progress_callback,
        save_warmup=save_warmup,
        return_raw_trace=return_raw_trace,
        progress_template=progress_template,
        progress_style=progress_style,
        progress_rate=progress_rate,
        store=zarr_store,
        store_unconstrained=store_unconstrained,
        checkpoint=checkpoint,
        checkpoint_every=checkpoint_every,
        resume_from=resume_from,
    )
    if not blocking:
        return background
    try:
        return background.wait()
    except KeyboardInterrupt:
        return background.abort()
    except BaseException:
        background.cancel()
        raise
