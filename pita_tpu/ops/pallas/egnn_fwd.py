"""Pallas TPU kernels: fused EGNN backbone forward (+ fused backward).

The XLA EGNN forward materializes ~6 (B, N², F) edge tensors per layer in
HBM; the whole-network fused kernel keeps every edge intermediate in VMEM —
HBM traffic collapses to the (B, N·F) node state and weights.

Two entry points:

- ``egnn_forward_pallas``: plain fused forward. Used on the sampler's score
  path (no AD required: the integrator stop-gradients its drift).
- ``egnn_forward_pallas_ad``: the same forward wrapped in a ``custom_vjp``
  whose backward is a second fused kernel — the whole reverse pass (with
  per-layer rematerialization, so one layer's edge tensors live in VMEM at a
  time) runs on-chip without ever writing an edge activation to HBM. This
  powers the drift's energy gradient ``∇_x U_θ`` (and ``∂U/∂t`` through the
  embedding chain outside the kernel). INFERENCE ONLY: weight cotangents are
  returned as zeros (the sampler stop-gradients its drift; training keeps the
  XLA path).

Matches ``nets/egnn_fast.egnn_apply`` (itself tested against the flax
module) up to float reassociation. Weights arrive stacked across layers
(L, ...) so the kernel signature stays fixed for any depth.
"""

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _sigmoid(z):
    """Overflow-safe logistic: exp never sees a positive argument, so both
    the value and its reverse-mode derivative stay finite for any z (the
    naive 1/(1+exp(-z)) backward is inf/inf = NaN for large negative z).
    Written in primitive ops so it lowers inside Pallas kernels."""
    return jnp.exp(jnp.minimum(z, 0.0)) / (1.0 + jnp.exp(-jnp.abs(z)))


def _silu(z):
    return z * _sigmoid(z)


_W_FIELDS = (
    "w_src", "b_src", "w_dst", "w_scal", "w_e2", "b_e2",
    "w_att", "b_att", "w_c1", "b_c1", "w_c2", "w_n1", "b_n1", "w_n2", "b_n2",
)


def _layer_step(h, xc, edge_attr, mask, lw, *, attention, tanh, coords_range, cd):
    """One EGCL layer on VMEM-resident values. lw: dict of this layer's
    weights. Returns (h_out, x_out)."""
    (w_src, b_src, w_dst, w_scal, w_e2, b_e2, w_att, b_att,
     w_c1, b_c1, w_c2, w_n1, b_n1, w_n2, b_n2) = (lw[f] for f in _W_FIELDS)
    bb, N, F = h.shape
    diff = xc[:, :, None, :] - xc[:, None, :, :]
    radial = jnp.sum(diff * diff, axis=-1)
    norm = jnp.sqrt(radial + 1e-8)
    denom = norm + 1.0

    src = h @ w_src.astype(cd) + b_src.astype(cd)
    dst = h @ w_dst.astype(cd)
    scal = (
        radial[..., None].astype(cd) * w_scal[0].astype(cd)
        + edge_attr[..., None].astype(cd) * w_scal[1].astype(cd)
    )
    z1 = src[:, :, None, :] + dst[:, None, :, :] + scal
    m1 = _silu(z1)
    # (bb·N·N, F) @ (F, F) on the MXU
    z2 = (m1.reshape(bb * N * N, F) @ w_e2.astype(cd)).reshape(bb, N, N, F) + b_e2.astype(cd)
    m = _silu(z2)
    if attention:
        att = _sigmoid(
            (m.reshape(bb * N * N, F) @ w_att.astype(cd)).reshape(bb, N, N)
            + b_att[0].astype(cd)
        )
    else:
        att = jnp.ones((bb, N, N), cd)
    m = m * (att * mask.astype(cd))[..., None]

    cz = (m.reshape(bb * N * N, F) @ w_c1.astype(cd)).reshape(bb, N, N, F) + b_c1.astype(cd)
    c1 = _silu(cz)
    cm = (c1.reshape(bb * N * N, F) @ w_c2.astype(cd)).reshape(bb, N, N).astype(jnp.float32)
    a = jnp.tanh(cm) * coords_range if tanh else cm
    a = a * mask
    w = a / denom
    x_out = (
        xc
        + xc * jnp.sum(w, axis=2)[..., None]
        - jnp.einsum("bnm,bmd->bnd", w, xc)
    )

    agg = jnp.sum(m, axis=2)
    node_in = jnp.concatenate([h, agg], axis=-1)
    nz = node_in @ w_n1.astype(cd) + b_n1.astype(cd)
    out = _silu(nz) @ w_n2.astype(cd)
    h_out = h + out + b_n2.astype(cd)
    return h_out, x_out


def _forward_core(h0, xs, lws, *, n_layers, n_particles, attention, tanh,
                  coords_range, cd, remat=False):
    """Whole-backbone forward on VMEM values. lws: list of per-layer weight
    dicts. With ``remat=True`` each layer is wrapped in ``jax.checkpoint`` so
    a reverse pass keeps only node states between layers (one layer's edge
    tensors live at a time)."""
    N = n_particles
    h = h0.astype(cd)
    xs = xs.astype(jnp.float32)
    eye = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0) == jax.lax.broadcasted_iota(
        jnp.int32, (N, N), 1
    )
    mask = jnp.where(eye, 0.0, 1.0)
    diff0 = xs[:, :, None, :] - xs[:, None, :, :]
    edge_attr = jnp.sum(diff0 * diff0, axis=-1)

    step = functools.partial(
        _layer_step, attention=attention, tanh=tanh,
        coords_range=coords_range, cd=cd,
    )
    if remat:
        step = jax.checkpoint(step, static_argnums=())

    xc = xs
    for l in range(n_layers):
        h, xc = step(h, xc, edge_attr, mask, lws[l])

    vel = xc - xs
    vel = vel - jnp.mean(vel, axis=1, keepdims=True)
    bb = vel.shape[0]
    return vel.reshape(bb, N * 3)


def _unstack_ws(w_refs, n_layers):
    """Per-layer weight dicts from the stacked (L, ...) kernel refs."""
    return [
        {f: w_refs[i][l] for i, f in enumerate(_W_FIELDS)} for l in range(n_layers)
    ]


def _fwd_kernel(h0_ref, x_ref, *rest, n_layers, n_particles, attention, tanh,
                coords_range, cd):
    w_refs, out_ref = rest[:-1], rest[-1]
    lws = _unstack_ws([r[...] for r in w_refs], n_layers)
    out = _forward_core(
        h0_ref[...], x_ref[...], lws,
        n_layers=n_layers, n_particles=n_particles, attention=attention,
        tanh=tanh, coords_range=coords_range, cd=cd,
    )
    out_ref[...] = out.astype(out_ref.dtype)


def _bwd_kernel(h0_ref, x_ref, *rest, n_layers, n_particles, attention, tanh,
                coords_range, cd):
    """Fused backward: recompute the forward per layer (jax.checkpoint) and
    backprop the cotangent — all edge tensors stay in VMEM."""
    g_ref = rest[-3]
    dh0_ref, dx_ref = rest[-2], rest[-1]
    w_refs = rest[:-3]
    lws = _unstack_ws([r[...] for r in w_refs], n_layers)

    def f(h0, xs):
        return _forward_core(
            h0, xs, lws,
            n_layers=n_layers, n_particles=n_particles, attention=attention,
            tanh=tanh, coords_range=coords_range, cd=cd, remat=True,
        )

    _, vjp = jax.vjp(f, h0_ref[...], x_ref[...])
    dh0, dx = vjp(g_ref[...].astype(jnp.float32))
    dh0_ref[...] = dh0.astype(dh0_ref.dtype)
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _stacked_ws(params, module):
    from pita_tpu.nets.egnn_fast import extract_params

    w_emb, b_emb, layers = extract_params(
        params, module.n_layers, module.attention
    )
    ws = [jnp.stack([getattr(lp, f) for lp in layers]) for f in _W_FIELDS]
    return w_emb, b_emb, ws


def _embed_nodes(module, t, x_flat, beta):
    """Node embedding (tiny; outside the kernel, differentiable in XLA)."""
    B = x_flat.shape[0]
    N = module.n_particles
    t = jnp.broadcast_to(jnp.asarray(t, x_flat.dtype).reshape(-1), (B,))
    feats = [jnp.broadcast_to(t[:, None, None], (B, N, 1))]
    if module.condition_on_temperature:
        bb_ = jnp.broadcast_to(jnp.asarray(beta, x_flat.dtype).reshape(-1), (B,))
        feats.append(jnp.broadcast_to(bb_[:, None, None], (B, N, 1)))
    if module.atom_types is not None:
        onehot = jax.nn.one_hot(
            jnp.asarray(module.atom_types),
            int(max(module.atom_types)) + 1,
            dtype=x_flat.dtype,
        )
        feats.append(jnp.broadcast_to(onehot[None], (B, N, onehot.shape[-1])))
    return jnp.concatenate(feats, axis=-1)


def _static_cfg(module):
    return dict(
        n_layers=module.n_layers,
        n_particles=module.n_particles,
        attention=module.attention,
        tanh=module.tanh,
        coords_range=module.coords_range / module.n_layers,
        cd=module.compute_dtype,
    )


def _call_fwd(h0, x3, ws, static, block_b, interpret):
    B, N, F = h0.shape
    D = x3.shape[-1]
    pad = (-B) % block_b
    h0p = jnp.pad(h0, ((0, pad), (0, 0), (0, 0)))
    xp = jnp.pad(x3, ((0, pad), (0, 0), (0, 0)))
    Bp = B + pad
    grid = (Bp // block_b,)
    kern = functools.partial(_fwd_kernel, **static)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, N, F), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, N, D), lambda i: (i, 0, 0)),
            *[full(w.shape) for w in ws],
        ],
        out_specs=pl.BlockSpec((block_b, N * D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, N * D), x3.dtype),
        interpret=interpret,
    )(h0p, xp, *ws)
    return out[:B]


def _call_bwd(h0, x3, ws, g, static, block_b, interpret):
    B, N, F = h0.shape
    D = x3.shape[-1]
    pad = (-B) % block_b
    h0p = jnp.pad(h0, ((0, pad), (0, 0), (0, 0)))
    xp = jnp.pad(x3, ((0, pad), (0, 0), (0, 0)))
    gp = jnp.pad(g, ((0, pad), (0, 0)))
    Bp = B + pad
    grid = (Bp // block_b,)
    kern = functools.partial(_bwd_kernel, **static)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    dh0, dx = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, N, F), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, N, D), lambda i: (i, 0, 0)),
            *[full(w.shape) for w in ws],
            pl.BlockSpec((block_b, N * D), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_b, N, F), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, N, D), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, N, F), h0.dtype),
            jax.ShapeDtypeStruct((Bp, N, D), x3.dtype),
        ],
        interpret=interpret,
    )(h0p, xp, *ws, gp)
    return dh0[:B], dx[:B]


_CORE_CACHE: dict = {}


def _get_core(static_key, static, block_b, interpret):
    """custom_vjp core for one (module config, block) combination."""
    key = (static_key, block_b, interpret)
    core = _CORE_CACHE.get(key)
    if core is not None:
        return core

    @jax.custom_vjp
    def core(h0, x3, ws):
        return _call_fwd(h0, x3, ws, static, block_b, interpret)

    def fwd(h0, x3, ws):
        return core(h0, x3, ws), (h0, x3, ws)

    def bwd(res, g):
        h0, x3, ws = res
        dh0, dx = _call_bwd(h0, x3, ws, g, static, block_b, interpret)
        # INFERENCE-ONLY: weights are treated as constants (the sampler
        # stop-gradients its drift); training uses the XLA path.
        dws = [jnp.zeros_like(w) for w in ws]
        return dh0, dx, dws

    core.defvjp(fwd, bwd)
    _CORE_CACHE[key] = core
    return core


@functools.partial(
    jax.jit,
    static_argnames=("module", "block_b", "interpret"),
)
def egnn_forward_pallas(params, module, t, x_flat, beta,
                        block_b: int = 8, interpret: bool = False):
    """Fused EGNN forward; signature-compatible with egnn_fast.egnn_apply."""
    w_emb, b_emb, ws = _stacked_ws(params, module)
    N, D = module.n_particles, module.n_spatial_dim
    B = x_flat.shape[0]
    h0 = _embed_nodes(module, t, x_flat, beta) @ w_emb + b_emb  # (B, N, F)
    return _call_fwd(
        h0, x_flat.reshape(B, N, D), ws, _static_cfg(module), block_b, interpret
    )


def egnn_forward_pallas_ad(params, module, t, x_flat, beta,
                           block_b: int = 8, interpret: bool = False):
    """Fused EGNN forward differentiable w.r.t. ``t``, ``x_flat``, ``beta``
    (NOT params — inference only) via a fused Pallas backward kernel.

    The t/β dependence flows through the node embedding built here in XLA;
    the custom VJP covers the backbone body. Plugs into the energy wrapper so
    the drift's ``∇_x U_θ`` / ``∂U/∂t`` run fully fused.
    """
    w_emb, b_emb, ws = _stacked_ws(params, module)
    N, D = module.n_particles, module.n_spatial_dim
    B = x_flat.shape[0]
    h0 = _embed_nodes(module, t, x_flat, beta) @ w_emb + b_emb
    static = _static_cfg(module)
    static_key = tuple(sorted((k, str(v)) for k, v in static.items()))
    core = _get_core(static_key, static, block_b, interpret)
    return core(h0, x_flat.reshape(B, N, D), list(ws))
