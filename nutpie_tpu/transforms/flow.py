"""Normalizing flows for Fisher-HMC reparameterization adaptation.

TPU-native re-design of the reference's flow subsystem
(``python/nutpie/normalizing_flow.py`` + ``transform_adapter.py``): the
sampler runs NUTS in the flow's base space z, where the pulled-back
posterior is approximately standard normal; the flow is trained during
warmup by minimizing the Fisher divergence
``log E[ || z + grad_z log p_z(z) ||^2 ]`` on accumulated (draw, gradient)
pairs (Seyboldt, Carlson & Carpenter 2026, arXiv:2603.18845).

Key architectural differences from the reference:

- the reference trains one flowjax/equinox flow per chain *on the host*,
  called back from Rust between draws; here every chain's flow parameters
  are a leaf of the device-resident adaptation state, and training runs
  vmapped over chains in one XLA program at chunk boundaries;
- score pullbacks use JAX autodiff (one vjp through the forward transform)
  instead of the reference's hand-written per-bijection inverse-gradient
  rules (``transform_adapter.py:199-301``) -- identical values, less code;
- the architecture is a gradient-informed diagonal affine (the reference's
  ``make_flow`` initialization, ``normalizing_flow.py:1902-1915``) followed
  by alternating-mask affine coupling layers with tanh-bounded log-scales.

Flow direction: ``x = forward(params, z)`` maps base space to the model's
unconstrained space; NUTS positions are z.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FlowConfig:
    """Static flow-adaptation configuration (reference hyperparameters:
    ``make_transform_adapter``, ``transform_adapter.py:870-953``)."""

    # Defaults tuned to pass the reference's 100-d funnel acceptance gate
    # (ESS > 1000 on all parameters, 0 divergences, fisher_distance < 0.1
    # with 2 chains x 1000 draws; ``docs/nf-adapt.qmd:75-101``) -- see
    # tests/test_flow.py::test_flow_funnel_100d_reference_gate.
    num_layers: int = 5
    hidden: int = 32
    learning_rate: float = 1e-3
    train_steps: int = 400
    window: int = 600          # ring buffer of (draw, grad) training pairs
    num_diag_updates: int = 3  # first updates refit only the diagonal
    scale_cap: float = 3.0     # bound on coupling log-scales
    grad_clip: float = 10.0
    update_freq: int = 64      # flow update cadence (chunk-aligned)
    # "train_on_orbit" (reference use_orbit_for_training, wrapper.rs:222):
    # additionally roll one uniformly reservoir-sampled leaf per trajectory
    # (its position and gradient, kept in the orbit_position/orbit_gradient
    # chunk buffers) into the training window -- orbit leaves reach further
    # into the tails than the multinomially selected draws, doubling the
    # window's coverage per draw at the cost of two extra chunk buffers
    use_orbit: bool = False
    # trainable Householder reflections interleaved after each coupling
    # (coordinate mixing beyond the alternating masks; reference
    # ``normalizing_flow.py:424-473``)
    householder: int = 0
    # elementwise sinh-asinh tail layer before the diagonal affine
    # (heavy/light tail control; reference Contract bijections,
    # ``normalizing_flow.py:1218-1408``)
    tails: bool = False
    # sinh-asinh tail transformer INSIDE each coupling: the conditioner
    # additionally predicts per-coordinate (skew s, log tailweight log t)
    # for the transformed half, ``x = sinh(t * asinh(y*e^ls + shift) + s)``.
    # Tail weight then varies with the conditioned-on coordinates -- the
    # per-coupling analog of the reference's ``Contract``/``Contract2``
    # family (``normalizing_flow.py:1218-1408``), which the terminal
    # ``tails`` layer (one global (s, t) pair per coordinate) cannot
    # express.  Identity at init (zero output weights => s=0, t=1).
    coupling_tails: bool = False
    # bound on |log t| and |s| in the coupling tail transformer; t in
    # [e^-cap, e^cap] keeps sinh growth ~|u|^t stable in f32
    tail_cap: float = 0.75
    # flow extension (reference extend_flow, normalizing_flow.py:2016-2238):
    # this share of the trailing coupling layers is RETARGETED at the end of
    # the diagonal phase -- their masks are reassigned so the coordinates
    # with worst per-coordinate Fisher cost (the geometry the diagonal fit
    # could not fix) land in the transformed slot.  The retarget happens
    # while those layers are still exact identities (zero output weights),
    # so the transform is unchanged at the switch point.  0 = off.
    extension_share: float = 0.0
    # DCT sandwich (reference dct_layer, normalizing_flow.py:1844-1852):
    # every other non-extension coupling acts in orthonormal-DCT frequency
    # space (rotate, couple, rotate back), so its mask splits low vs high
    # frequencies instead of even vs odd coordinates -- captures global
    # correlation structure (e.g. random-walk / AR priors) that coordinate
    # masks cannot.  The rotation is a [dim, dim] matmul (MXU-friendly) and
    # orthogonal, so it contributes no logdet.
    dct: bool = False
    # cosine learning-rate decay (lr -> lr/10 across train_steps).  With
    # best-params tracking this cannot hurt the accepted fit; it damps
    # the late-training parameter noise that f32 Fisher training shows on
    # nested funnels.  Off by default so x64 goldens/gates stay
    # bit-stable; the f32 recipe (sample._apply_f32_flow_recipe) turns it
    # on.
    lr_decay: bool = False
    # low-rank factored conditioner (reference FactoredMLP,
    # normalizing_flow.py:125-250): the first conditioner layer
    # [dim, hidden] is factored as [dim, r] @ [r, hidden].  For large dim
    # this cuts per-chain parameter memory and training FLOPs from
    # O(dim*hidden) to O((dim+hidden)*r) per layer.  0 = dense.
    factor_rank: int = 0


def _n_extension(cfg: "FlowConfig") -> int:
    return int(round(cfg.extension_share * cfg.num_layers))


def _layer_uses_dct(cfg: "FlowConfig", i: int) -> bool:
    """DCT sandwiches go on odd-indexed non-extension couplings (the
    even-indexed ones keep coordinate masks, mirroring the reference's
    alternation); extension layers stay in coordinate space because their
    masks are retargeted from per-COORDINATE Fisher costs."""
    return cfg.dct and i % 2 == 1 and i < cfg.num_layers - _n_extension(cfg)


def _dct_matrix(dim: int, dtype):
    """Orthonormal DCT-II matrix as a compile-time constant (host numpy),
    so XLA embeds it instead of re-deriving it per call."""
    import numpy as np

    n = np.arange(dim)
    mat = np.sqrt(2.0 / dim) * np.cos(
        np.pi * np.outer(n, n + 0.5) / dim
    )
    mat[0] *= np.sqrt(0.5)
    return jnp.asarray(mat, dtype)


class FlowParams(NamedTuple):
    mu: jax.Array         # [dim]
    log_sigma: jax.Array  # [dim]
    w1: jax.Array         # [layers, dim, hidden] (empty when factored)
    w1u: jax.Array        # [layers, dim, rank]   (empty when dense)
    w1v: jax.Array        # [layers, rank, hidden]
    b1: jax.Array         # [layers, hidden]
    w2: jax.Array         # [layers, hidden, k*dim], k = _coupling_width(cfg)
    b2: jax.Array         # [layers, k*dim]
    hh_v: jax.Array       # [n_householder, dim] reflection vectors
    tail_s: jax.Array     # [dim] sinh-asinh skew (0 = none)
    tail_log_t: jax.Array # [dim] sinh-asinh log tailweight (0 = identity)
    # coupling masks (1 = conditioned-on half, 0 = transformed half); data,
    # not trained -- train_flow zeros their gradient.  Kept in the params
    # pytree so mask retargeting (extension) rides the existing accept /
    # rebase machinery
    masks: jax.Array      # [layers, dim]


def _masks(num_layers: int, dim: int, dtype):
    """Alternating even/odd coordinate masks (1 = pass-through half)."""
    base = (jnp.arange(dim) % 2).astype(dtype)
    return jnp.stack(
        [base if i % 2 == 0 else 1.0 - base for i in range(num_layers)]
    )


def init_flow_params(cfg: FlowConfig, dim: int, key, dtype) -> FlowParams:
    k1 = jax.random.fold_in(key, 0)
    r = max(cfg.factor_rank, 0)
    if r > 0:
        # factored conditioner: w1 is empty, capacity lives in w1u @ w1v
        w1 = jnp.zeros((cfg.num_layers, 0, cfg.hidden), dtype)
        w1u = 0.01 * jax.random.normal(k1, (cfg.num_layers, dim, r), dtype)
        w1v = jax.random.normal(
            jax.random.fold_in(key, 2), (cfg.num_layers, r, cfg.hidden), dtype
        ) / jnp.sqrt(jnp.asarray(float(r), dtype))
    else:
        w1 = 0.01 * jax.random.normal(
            k1, (cfg.num_layers, dim, cfg.hidden), dtype
        )
        w1u = jnp.zeros((cfg.num_layers, dim, 0), dtype)
        w1v = jnp.zeros((cfg.num_layers, 0, cfg.hidden), dtype)
    n_hh = max(cfg.householder, 0) * cfg.num_layers if cfg.householder else 0
    k2 = jax.random.fold_in(key, 1)
    hh_v = jnp.zeros((n_hh, dim), dtype)
    if n_hh:
        # near-axis random reflections (exact reflections regardless of
        # norm; the direction is what trains)
        hh_v = jax.random.normal(k2, (n_hh, dim), dtype)
    return FlowParams(
        mu=jnp.zeros((dim,), dtype),
        log_sigma=jnp.zeros((dim,), dtype),
        w1=w1,
        w1u=w1u,
        w1v=w1v,
        b1=jnp.zeros((cfg.num_layers, cfg.hidden), dtype),
        # zero output layer -> the couplings start as exact identities
        # (shift 0, log-scale 0, and with coupling_tails s=0 / log t=0)
        w2=jnp.zeros(
            (cfg.num_layers, cfg.hidden, _coupling_width(cfg) * dim), dtype
        ),
        b2=jnp.zeros((cfg.num_layers, _coupling_width(cfg) * dim), dtype),
        hh_v=hh_v,
        tail_s=jnp.zeros((dim,), dtype),
        tail_log_t=jnp.zeros((dim,), dtype),
        masks=_masks(cfg.num_layers, dim, dtype),
    )


def _householder(v: jax.Array, y: jax.Array) -> jax.Array:
    """Reflection across the hyperplane orthogonal to v (self-inverse)."""
    vn = v / jnp.sqrt(jnp.maximum(jnp.sum(v * v), 1e-12))
    return y - 2.0 * vn * jnp.dot(vn, y)


def _tail_forward(params: FlowParams, y: jax.Array):
    """Sinh-asinh: x = sinh(t * asinh(y) + s); identity at (s=0, t=1)."""
    t = jnp.exp(params.tail_log_t)
    a = jnp.arcsinh(y)
    x = jnp.sinh(t * a + params.tail_s)
    logdet = jnp.sum(
        params.tail_log_t
        + jnp.log(jnp.cosh(t * a + params.tail_s))
        - 0.5 * jnp.log1p(y * y)
    )
    return x, logdet


def _tail_inverse(params: FlowParams, x: jax.Array) -> jax.Array:
    t = jnp.exp(params.tail_log_t)
    return jnp.sinh((jnp.arcsinh(x) - params.tail_s) / t)


def _coupling_width(cfg: FlowConfig) -> int:
    """Conditioner outputs per coordinate: (shift, log_scale) plus the
    sinh-asinh (s, log t) heads when ``coupling_tails`` is on."""
    return 4 if cfg.coupling_tails else 2


def _coupling_nets(cfg: FlowConfig, params: FlowParams, layer: int,
                   masked: jax.Array):
    if cfg.factor_rank > 0:
        pre = (masked @ params.w1u[layer]) @ params.w1v[layer]
    else:
        pre = masked @ params.w1[layer]
    h = jnp.tanh(pre + params.b1[layer])
    out = h @ params.w2[layer] + params.b2[layer]
    dim = params.mu.shape[0]
    shift = out[..., :dim]
    log_scale = cfg.scale_cap * jnp.tanh(out[..., dim:2 * dim] / cfg.scale_cap)
    if not cfg.coupling_tails:
        return shift, log_scale, None, None
    cap = cfg.tail_cap
    t_s = cap * jnp.tanh(out[..., 2 * dim:3 * dim] / cap)
    t_log_t = cap * jnp.tanh(out[..., 3 * dim:] / cap)
    return shift, log_scale, t_s, t_log_t


def flow_forward(cfg: FlowConfig, params: FlowParams, z: jax.Array):
    """z (base) -> (x, logdet)."""
    masks = jax.lax.stop_gradient(params.masks)
    dct_mat = _dct_matrix(z.shape[-1], z.dtype) if cfg.dct else None
    y = z
    logdet = jnp.zeros((), z.dtype)
    for i in range(cfg.num_layers):
        m = masks[i]
        sandwich = _layer_uses_dct(cfg, i)
        if sandwich:  # couple in frequency space (orthogonal: logdet 0)
            y = dct_mat @ y
        shift, log_scale, t_s, t_log_t = _coupling_nets(
            cfg, params, i, y * m
        )
        free = 1.0 - m
        u = y * jnp.exp(log_scale) + shift
        ld = log_scale
        if cfg.coupling_tails:
            # sinh-asinh on the transformed half (per-coupling Contract)
            a = jnp.exp(t_log_t) * jnp.arcsinh(u) + t_s
            ld = ld + t_log_t + jnp.log(jnp.cosh(a)) - 0.5 * jnp.log1p(u * u)
            u = jnp.sinh(a)
        y = m * y + free * u
        logdet = logdet + jnp.sum(free * ld)
        if sandwich:
            y = dct_mat.T @ y
        for h in range(cfg.householder):
            y = _householder(params.hh_v[i * cfg.householder + h], y)
    if cfg.tails:
        y, tail_ld = _tail_forward(params, y)
        logdet = logdet + tail_ld
    x = params.mu + jnp.exp(params.log_sigma) * y
    logdet = logdet + jnp.sum(params.log_sigma)
    return x, logdet


def flow_inverse(cfg: FlowConfig, params: FlowParams, x: jax.Array):
    """x (model space) -> z (base)."""
    masks = jax.lax.stop_gradient(params.masks)
    dct_mat = _dct_matrix(x.shape[-1], x.dtype) if cfg.dct else None
    y = (x - params.mu) * jnp.exp(-params.log_sigma)
    if cfg.tails:
        y = _tail_inverse(params, y)
    for i in reversed(range(cfg.num_layers)):
        for h in reversed(range(cfg.householder)):
            y = _householder(params.hh_v[i * cfg.householder + h], y)
        sandwich = _layer_uses_dct(cfg, i)
        if sandwich:
            y = dct_mat @ y
        m = masks[i]
        shift, log_scale, t_s, t_log_t = _coupling_nets(
            cfg, params, i, y * m
        )
        free = 1.0 - m
        u = y
        if cfg.coupling_tails:
            u = jnp.sinh((jnp.arcsinh(y) - t_s) * jnp.exp(-t_log_t))
        y = m * y + free * ((u - shift) * jnp.exp(-log_scale))
        if sandwich:
            y = dct_mat.T @ y
    return y


def make_flow_logp(cfg: FlowConfig, logp_fn):
    """The pulled-back log density: logp_z(z) = logp(F(z)) + logdet."""

    def flow_logp(z, params: FlowParams):
        x, logdet = flow_forward(cfg, params, z)
        return logp_fn(x) + logdet

    return flow_logp


def pullback_score(cfg: FlowConfig, params: FlowParams, x: jax.Array,
                   g: jax.Array):
    """(x, grad_x logp) -> (z, grad_z logp_z) without re-evaluating logp.

    grad_z [logp(F(z)) + logdet(z)] = J_F^T g + grad_z logdet, obtained from
    one vjp through the forward transform (exact; replaces the reference's
    bijection-dispatched ``inverse_gradient_and_val``).
    """
    z = flow_inverse(cfg, params, x)
    _, vjp = jax.vjp(lambda zz: flow_forward(cfg, params, zz), z)
    (score,) = vjp((g, jnp.ones((), x.dtype)))
    return z, score


def fisher_distance(z: jax.Array, score_z: jax.Array) -> jax.Array:
    """Per-draw Fisher distance: mean((z + grad_z logp_z)^2).

    For a perfectly trained flow the pullback is standard normal, whose
    score is -z, making this zero (acceptance gate in the reference:
    mean < 0.1, ``tests/test_pymc.py:495``).
    """
    return jnp.mean(jnp.square(z + score_z))


def _fisher_loss(cfg: FlowConfig, params: FlowParams, xs, gs, valid):
    """log E[ sum_coords (z + score)^2 ] over the valid window rows."""
    z, score = jax.vmap(lambda x, g: pullback_score(cfg, params, x, g))(xs, gs)
    per_draw = jnp.sum(jnp.square(z + score), axis=-1)
    per_draw = jnp.where(valid, per_draw, 0.0)
    n = jnp.maximum(jnp.sum(valid), 1)
    mean = jnp.sum(per_draw) / n
    return jnp.log(jnp.maximum(mean, 1e-30))


def refit_diag(params: FlowParams, xs, gs, valid) -> FlowParams:
    """Gradient-informed diagonal refit (reference ``make_flow``:
    sigma = sqrt(std(draws)/std(grads)),
    mu = mean(draws) + mean(grads) * sigma^2;
    ``normalizing_flow.py:1902-1915``)."""
    v = valid[:, None]
    n = jnp.maximum(jnp.sum(valid), 2.0)
    mean_x = jnp.sum(xs * v, 0) / n
    mean_g = jnp.sum(gs * v, 0) / n
    var_x = jnp.sum(jnp.square(xs - mean_x) * v, 0) / (n - 1)
    var_g = jnp.sum(jnp.square(gs - mean_g) * v, 0) / (n - 1)
    sigma = jnp.sqrt(jnp.sqrt(
        jnp.maximum(var_x, 1e-12) / jnp.maximum(var_g, 1e-12)
    ))
    sigma2 = jnp.square(sigma)
    mu = mean_x + mean_g * sigma2
    ok = jnp.all(jnp.isfinite(sigma)) & jnp.all(jnp.isfinite(mu))
    mu = jnp.where(ok, mu, params.mu)
    log_sigma = jnp.where(ok, jnp.log(sigma), params.log_sigma)
    return params._replace(mu=mu, log_sigma=log_sigma)


class FlowOptState(NamedTuple):
    m: FlowParams
    v: FlowParams
    count: jax.Array


def train_flow(cfg: FlowConfig, params: FlowParams, xs, gs, valid):
    """Full-batch Adam on the Fisher loss with best-params tracking.

    Returns ``(best_params, best_loss, improved)``.  Updates that fail to
    improve on the starting loss, or that produce nonfinite losses, leave
    the flow unchanged (reference failure-degradation protocol,
    ``transform_adapter.py:753-786``).
    """
    loss_fn = lambda p: _fisher_loss(cfg, p, xs, gs, valid)
    loss0 = loss_fn(params)

    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    opt0 = FlowOptState(m=zeros, v=zeros, count=jnp.zeros((), xs.dtype))
    b1, b2, lr = 0.9, 0.999, cfg.learning_rate

    def step(carry, _):
        p, opt, best_p, best_l = carry
        loss, grads = jax.value_and_grad(loss_fn)(p)
        gnorm = jnp.sqrt(sum(
            jnp.sum(jnp.square(g)) for g in jax.tree_util.tree_leaves(grads)
        ))
        clip = jnp.minimum(1.0, cfg.grad_clip / jnp.maximum(gnorm, 1e-12))
        grads = jax.tree_util.tree_map(lambda g: g * clip, grads)
        count = opt.count + 1
        m = jax.tree_util.tree_map(
            lambda a, g: b1 * a + (1 - b1) * g, opt.m, grads
        )
        v = jax.tree_util.tree_map(
            lambda a, g: b2 * a + (1 - b2) * g * g, opt.v, grads
        )
        mh = jax.tree_util.tree_map(lambda a: a / (1 - b1**count), m)
        vh = jax.tree_util.tree_map(lambda a: a / (1 - b2**count), v)
        if cfg.lr_decay:
            frac = (count - 1) / cfg.train_steps
            lr_t = lr * (0.1 + 0.45 * (1 + jnp.cos(jnp.pi * frac)))
        else:
            lr_t = lr
        p_new = jax.tree_util.tree_map(
            lambda pp, a, bb: pp - lr_t * a / (jnp.sqrt(bb) + 1e-8),
            p, mh, vh
        )
        finite = jnp.isfinite(loss)
        p_new = jax.tree_util.tree_map(
            lambda a, b_: jnp.where(finite, a, b_), p_new, p
        )
        better = finite & (loss < best_l)
        best_p = jax.tree_util.tree_map(
            lambda a, b_: jnp.where(better, a, b_), p, best_p
        )
        best_l = jnp.where(better, loss, best_l)
        return (p_new, FlowOptState(m, v, count), best_p, best_l), loss

    (p_fin, _, best_p, best_l), _ = jax.lax.scan(
        step, (params, opt0, params, loss0), None, length=cfg.train_steps
    )
    # final candidate may be the best
    l_fin = loss_fn(p_fin)
    better = jnp.isfinite(l_fin) & (l_fin < best_l)
    best_p = jax.tree_util.tree_map(
        lambda a, b_: jnp.where(better, a, b_), p_fin, best_p
    )
    best_l = jnp.where(better, l_fin, best_l)
    improved = best_l < loss0
    return best_p, best_l, improved


def retarget_extension_masks(fcfg: FlowConfig, flow: FlowParams, *,
                             allowed, win_draws, win_grads, valid
                             ) -> FlowParams:
    """Point the trailing extension layers at the worst-cost coordinates.

    Reference ``extend_flow`` inserts new layers permuted so the
    worst-Fisher-cost coordinates land in the transformed slot
    (``normalizing_flow.py:2016-2238``).  The TPU build pre-allocates those
    layers (static shapes under jit) as exact identities (zero output
    weights) and REASSIGNS their masks instead: per-coordinate cost
    ``mean((z_j + score_j)^2)`` over the window, coordinates at or above
    the median cost go to the transformed (mask 0) slot.  While the layers
    are identities a mask change alters no transform values, so this is a
    pure re-aim of upcoming training capacity; once a training step under
    the new masks is accepted (nonzero output weights), the masks freeze.
    """
    n_ext = int(round(fcfg.extension_share * fcfg.num_layers))
    if n_ext <= 0:
        return flow
    dim = win_draws.shape[1]
    can = allowed & jnp.all(flow.w2[-n_ext:] == 0.0)
    nz = jnp.maximum(jnp.sum(valid), 1).astype(win_draws.dtype)
    cost = jnp.sum(
        jnp.where(valid[:, None], jnp.square(win_draws + win_grads), 0.0),
        axis=0,
    ) / nz
    # worst-cost half in the transformed slot; consecutive extension layers
    # alternate with the COMPLEMENT mask (identical masks in consecutive
    # couplings compose into one effective coupling -- alternation keeps
    # full coordinate coverage while the worst coordinates still get
    # transformed first and most often)
    row = jnp.where(cost >= jnp.median(cost), 0.0, 1.0).astype(
        win_draws.dtype
    )
    ext_rows = jnp.stack([
        row if j % 2 == 0 else 1.0 - row for j in range(n_ext)
    ])
    new_masks = flow.masks.at[fcfg.num_layers - n_ext:].set(ext_rows)
    return flow._replace(
        masks=jnp.where(can, new_masks, flow.masks)
    )


class FlowWindow(NamedTuple):
    """Per-chain flow-training window + parameters (shared by NUTS/MCLMC).

    Carried inside the sampler's adaptation state; updated only at chunk
    boundaries (per-step window writes would cost O(window*dim) per
    leapfrog on TPU).
    """

    flow: FlowParams
    flow_updates: jax.Array  # i32
    win_draws: jax.Array     # [window, dim] base-space positions
    win_grads: jax.Array     # [window, dim] base-space gradients
    win_valid: jax.Array     # [window] bool


def init_flow_window(cfg: FlowConfig, dim: int, key, dtype) -> FlowWindow:
    W = cfg.window
    return FlowWindow(
        flow=init_flow_params(cfg, dim, key, dtype),
        flow_updates=jnp.zeros((), jnp.int32),
        win_draws=jnp.zeros((W, dim), dtype),
        win_grads=jnp.zeros((W, dim), dtype),
        win_valid=jnp.zeros((W,), bool),
    )


def chunk_flow_update(
    fcfg: FlowConfig,
    logp_fn,
    win: FlowWindow,
    position: jax.Array,
    gradient: jax.Array,
    logp: jax.Array,
    buf_pos: jax.Array,     # [L, dim] chunk draws in base space
    buf_grad: jax.Array,    # [L, dim] chunk gradients in base space
    rows_ok: jax.Array,     # [L] bool validity of each chunk row
    in_warmup: jax.Array,   # scalar bool: training still allowed
):
    """One per-chain flow-training step at a chunk boundary.

    Rolls the chunk's (z, grad_z) draws into the training window, expresses
    the window in model space through the current flow, trains (diagonal
    refit for the first ``num_diag_updates``, Fisher-loss Adam after), and
    re-bases the chain into the new flow's base space.  Returns
    ``(new_window, position, gradient, logp)``; all failure modes leave the
    flow unchanged (reference degradation protocol,
    ``transform_adapter.py:753-786``).  Vmapped over chains by the caller.
    """
    from ..sampler.state import tree_where as _tw

    W = fcfg.window
    win_draws = jnp.concatenate(
        [win.win_draws, jnp.nan_to_num(buf_pos)], 0
    )[-W:]
    win_grads = jnp.concatenate(
        [win.win_grads, jnp.nan_to_num(buf_grad)], 0
    )[-W:]
    valid = jnp.concatenate([win.win_valid, rows_ok], 0)[-W:]
    n_valid = jnp.sum(valid)
    due = in_warmup & (n_valid >= jnp.minimum(32, W))

    # flow extension: once the diagonal phase ends, retarget the trailing
    # extension layers' masks at the worst-Fisher-cost coordinates.  If the
    # first training under the new masks is rejected, the layers stay
    # identity and the retarget retries with the refreshed window next time.
    cur_flow = win.flow
    if int(round(fcfg.extension_share * fcfg.num_layers)) > 0:
        cur_flow = retarget_extension_masks(
            fcfg, cur_flow,
            allowed=win.flow_updates >= fcfg.num_diag_updates,
            win_draws=win_draws, win_grads=win_grads, valid=valid,
        )

    # window (z, grad_z) -> model space (x, grad_x) through the current
    # flow: one vjp through the inverse transform per row
    def to_model_space(z, gz):
        x, _ = flow_forward(fcfg, cur_flow, z)

        def inv_logdet(xx):
            zz = flow_inverse(fcfg, cur_flow, xx)
            _, fld = flow_forward(fcfg, cur_flow, zz)
            return zz, -fld

        _, vjp = jax.vjp(inv_logdet, x)
        (gx,) = vjp((gz, jnp.ones((), z.dtype)))
        return x, gx

    xs, gxs = jax.vmap(to_model_space)(win_draws, win_grads)
    xs = jnp.where(valid[:, None], xs, 0.0)
    gxs = jnp.where(valid[:, None], gxs, 0.0)

    diag_phase = win.flow_updates < fcfg.num_diag_updates
    new_diag = refit_diag(cur_flow, xs, gxs, valid)
    trained, _, improved = train_flow(fcfg, cur_flow, xs, gxs, valid)
    candidate = _tw(diag_phase, new_diag, trained)
    accept = due & (diag_phase | improved)
    new_flow = _tw(accept, candidate, win.flow)

    # re-base the chain into the new flow's coordinates
    flow_logp = make_flow_logp(fcfg, logp_fn)
    x_cur, _ = flow_forward(fcfg, win.flow, position)
    z_new = flow_inverse(fcfg, new_flow, x_cur)
    logp_new, grad_new = jax.value_and_grad(flow_logp)(z_new, new_flow)
    rebase_ok = accept & jnp.isfinite(logp_new) & jnp.all(
        jnp.isfinite(grad_new)
    ) & jnp.all(jnp.isfinite(z_new))
    new_flow = _tw(rebase_ok, new_flow, win.flow)
    position = jnp.where(rebase_ok, z_new, position)
    gradient = jnp.where(rebase_ok, grad_new, gradient)
    logp = jnp.where(rebase_ok, logp_new, logp)

    new_win = FlowWindow(
        flow=new_flow,
        flow_updates=win.flow_updates + due.astype(jnp.int32),
        win_draws=win_draws,
        win_grads=win_grads,
        # training pairs in old coordinates are stale after a flow change
        win_valid=valid & ~rebase_ok,
    )
    return new_win, position, gradient, logp


def chunk_to_model_space(fcfg: FlowConfig, flow: FlowParams,
                         positions: jax.Array, gradients=None):
    """Express a chunk's base-space draws in model space (per chain).

    Returns ``(xs, logdets, gxs)`` with ``gxs=None`` when no gradients are
    given; model-space logp is ``logp_z - logdet``.
    """
    xs, logdets = jax.vmap(lambda z: flow_forward(fcfg, flow, z))(positions)
    gxs = None
    if gradients is not None:
        def push(x, gz):
            def inv_logdet(xx):
                zz = flow_inverse(fcfg, flow, xx)
                _, fld = flow_forward(fcfg, flow, zz)
                return zz, -fld

            _, vjp = jax.vjp(inv_logdet, x)
            (gx,) = vjp((gz, jnp.ones((), x.dtype)))
            return gx

        gxs = jax.vmap(push)(xs, gradients)
    return xs, logdets, gxs
