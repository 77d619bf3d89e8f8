"""Pallas TPU kernels: fused EGNN layer forward / backward / tangent.

The XLA EGNN materializes ~6 (B, N², F) edge tensors per layer in HBM — the
whole pipeline is HBM-bound on them. These kernels fuse ONE EGCL layer each:
every edge tensor lives only in VMEM; HBM carries node-sized states
((B, Np, F) features, (B, 3, Np) coordinates) between layers plus the single
(B, Np, Np) edge-attribute map. One-layer kernels keep Mosaic's vector IR
small (whole-graph fusion was measured at >25 min of Mosaic compile; a layer
compiles in ~1–3 min and is reused for every layer, config-cached across
processes by the persistent compilation cache).

Entry points:

- ``egnn_forward_pallas``: fused forward (the sampler's score path).
- ``egnn_forward_pallas_ad``: forward differentiable w.r.t. t/x/β via
  per-layer ``custom_vjp`` whose backward is a fused layer kernel
  (in-kernel ``jax.vjp``, edge tensors rebuilt in VMEM). Powers the drift's
  ``∇_x U_θ`` / ``∂U/∂t``. INFERENCE ONLY: weight cotangents are zeros.
- ``egnn_jacobian_trace_pallas``: exact tr dF/dx — the coordinate tangent
  basis is pushed through per-layer linearized kernels in chunks; tangent
  edge tensors never reach HBM. The FK weight drift's divergence at
  FLOP-limited speed.

TPU layout rules baked in (Mosaic rejects unaligned relayouts):
- particles are padded to a multiple of 16 (masked edges);
- coordinates ride as (B, 3, Np) so no matmul has a minor dim of 3;
- scalar-headed "matmuls" (attention logit, coordinate scalar) are lane
  reductions, never (·, F) @ (F, 1);
- elementwise math in f32 (bf16 vectors cannot do unit-sublane relayouts);
  matmul INPUTS cast to the compute dtype with f32 accumulation.

Matches ``nets/egnn_fast.egnn_apply`` (itself tested against the flax
module) up to float reassociation.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic's default scoped-VMEM budget is 16 MB; the fused layer kernels hold
# a few (·, Np, Np, F) f32 edge tensors at a time and legitimately need more
# on chips that have it (v5e: 128 MB physical)
_VMEM_LIMIT = 100 * 1024 * 1024


def _compiler_params(interpret):
    return (
        None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    )


def _mm(a, b, cd):
    """Matmul contracting a's last dim with b's first. Inputs cast to the
    compute dtype (bf16 feeds the MXU at full rate), accumulation and result
    f32 (Mosaic rejects bf16 accumulators)."""
    return jax.lax.dot_general(
        a.astype(cd), b.astype(cd), (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


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


def _layer_step(h, xc, edge_attr, mask, lw, *, attention, tanh, coords_range,
                cd):
    """One EGCL layer on VMEM values, generic over leading batch dims.
    h: (..., Np, F); xc: (..., 3, Np); edge_attr: (..., Np, Np);
    mask: (Np, Np). Returns (h_out, x_out)."""
    (w_src, b_src, w_dst, w_scal, w_e2, b_e2, w_att, b_att,
     w_c1, b_c1, w_c2, w_n1, b_n1, w_n2, b_n2) = (
        lw[f].astype(jnp.float32) for f in _W_FIELDS
    )
    diff = xc[..., :, :, None] - xc[..., :, None, :]  # (..., 3, Np, Np)
    radial = jnp.sum(diff * diff, axis=-3)  # (..., Np, Np)
    norm = jnp.sqrt(radial + 1e-8)
    denom = norm + 1.0

    src = _mm(h, w_src, cd) + b_src
    dst = _mm(h, w_dst, cd)
    scal = radial[..., None] * w_scal[0] + edge_attr[..., None] * w_scal[1]
    z1 = src[..., :, None, :] + dst[..., None, :, :] + scal  # (..., Np, Np, F)
    m1 = _silu(z1)
    z2 = _mm(m1, w_e2, cd) + b_e2
    m = _silu(z2)
    if attention:
        # (·, F) @ (F, 1) has a minor dim of 1 — use a lane reduction instead
        att = _sigmoid(jnp.sum(m * w_att[:, 0], axis=-1) + b_att[0])
    else:
        att = jnp.ones_like(z2[..., 0])
    m = m * (att * mask)[..., None]

    cz = _mm(m, w_c1, cd) + b_c1
    c1 = _silu(cz)
    cm = jnp.sum(c1 * w_c2[:, 0], axis=-1)
    a = jnp.tanh(cm) * coords_range if tanh else cm
    a = a * mask
    w = a / denom  # (..., Np, Np)
    # x_out[d, n] = xc[d, n]·Σ_m w[n, m] − Σ_m w[n, m]·xc[d, m]
    # (a (3, Np) @ (Np, Np) matmul is MXU-hostile and its vmapped-jvp form
    # fails Mosaic relayout — three lane reductions do the same work)
    wx = jnp.concatenate(
        [
            jnp.sum(w * xc[..., d : d + 1, :], axis=-1)[..., None, :]
            for d in range(3)
        ],
        axis=-2,
    )  # (..., 3, Np)
    x_out = xc + xc * jnp.sum(w, axis=-1)[..., None, :] - wx

    agg = jnp.sum(m, axis=-2)  # (..., Np, F)
    node_in = jnp.concatenate([h, agg], axis=-1)
    nz = _mm(node_in, w_n1, cd) + b_n1
    out = _mm(_silu(nz), w_n2, cd)
    h_out = h + out + b_n2
    return h_out, x_out


def _edge_mask(Np, n_particles):
    eye = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 0) == (
        jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 1)
    )
    node_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (Np,), 0) < n_particles
    ).astype(jnp.float32)
    pair_mask = node_mask[:, None] * node_mask[None, :]
    return jnp.where(eye, 0.0, pair_mask), node_mask


# ------------------------------------------------------------- layer kernels


def _layer_fwd_kernel(h_ref, x_ref, ea_ref, *rest, n_particles, attention,
                      tanh, coords_range, cd):
    w_refs = rest[:-2]
    h_out_ref, x_out_ref = rest[-2:]
    lw = {f: w_refs[i][...] for i, f in enumerate(_W_FIELDS)}
    Np = x_ref.shape[-1]
    mask, _ = _edge_mask(Np, n_particles)
    h_out, x_out = _layer_step(
        h_ref[...].astype(jnp.float32), x_ref[...].astype(jnp.float32),
        ea_ref[...], mask, lw,
        attention=attention, tanh=tanh, coords_range=coords_range, cd=cd,
    )
    h_out_ref[...] = h_out.astype(h_out_ref.dtype)
    x_out_ref[...] = x_out.astype(x_out_ref.dtype)


def _layer_bwd_kernel(h_ref, x_ref, ea_ref, gh_ref, gx_ref, *rest,
                      n_particles, attention, tanh, coords_range, cd):
    """Cotangents (dh, dx, dea) of one layer — forward rebuilt in VMEM."""
    w_refs = rest[:-3]
    dh_ref, dx_ref, dea_ref = rest[-3:]
    lw = {f: w_refs[i][...] for i, f in enumerate(_W_FIELDS)}
    Np = x_ref.shape[-1]
    mask, _ = _edge_mask(Np, n_particles)

    def f(h, x, ea):
        return _layer_step(
            h, x, ea, mask, lw,
            attention=attention, tanh=tanh, coords_range=coords_range, cd=cd,
        )

    _, vjp = jax.vjp(
        f, h_ref[...].astype(jnp.float32), x_ref[...].astype(jnp.float32),
        ea_ref[...],
    )
    dh, dx, dea = vjp((gh_ref[...].astype(jnp.float32),
                       gx_ref[...].astype(jnp.float32)))
    dh_ref[...] = dh.astype(dh_ref.dtype)
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dea_ref[...] = dea.astype(dea_ref.dtype)


def _layer_tan_kernel(h_ref, x_ref, ea_ref, xs0_ref, basis_ref, dh_ref,
                      dx_ref, *rest, n_particles, attention, tanh,
                      coords_range, cd):
    """Tangent propagation of one layer for a chunk of coordinate-basis
    tangents: the layer is linearized at its (chain-local) primal inputs once
    and the tangent chunk pushed through the linear map — all (tc, Np, Np, F)
    tangent edge tensors stay in VMEM.

    Block: ONE chain × tc tangents. basis: the chunk's (tc, 3, Np) one-hot
    coordinate tangents (zero rows for tail padding). The edge-attribute
    tangent is rebuilt from the original coordinates xs0:
      dea[i, j] = 2·Σ_d diff0[d, i, j]·(e[d, i] − e[d, j]).
    """
    w_refs = rest[:-2]
    dh_out_ref, dx_out_ref = rest[-2:]
    lw = {f: w_refs[i][...] for i, f in enumerate(_W_FIELDS)}
    Np = x_ref.shape[-1]
    mask, _ = _edge_mask(Np, n_particles)

    h = h_ref[0].astype(jnp.float32)  # (Np, F)
    xc = x_ref[0].astype(jnp.float32)  # (3, Np)
    ea = ea_ref[0]
    xs0 = xs0_ref[0].astype(jnp.float32)
    diff0 = xs0[:, :, None] - xs0[:, None, :]  # (3, Np, Np)

    def f(hh, xx, ee):
        return _layer_step(
            hh, xx, ee, mask, lw,
            attention=attention, tanh=tanh, coords_range=coords_range, cd=cd,
        )

    _, lin = jax.linearize(f, h, xc, ea)

    def tangent_one(e, dh_t, dx_t):
        du = e[:, :, None] - e[:, None, :]  # (3, Np, Np)
        dea_t = 2.0 * jnp.sum(diff0 * du, axis=0)  # (Np, Np)
        return lin(dh_t, dx_t, dea_t)

    dh_out, dx_out = jax.vmap(tangent_one)(
        basis_ref[...].astype(jnp.float32),
        dh_ref[0].astype(jnp.float32),
        dx_ref[0].astype(jnp.float32),
    )
    dh_out_ref[...] = dh_out[None].astype(dh_out_ref.dtype)
    dx_out_ref[...] = dx_out[None].astype(dx_out_ref.dtype)


# --------------------------------------------------------------------- host


def _stacked_ws(params, module):
    from pita_tpu.nets.egnn_fast import extract_params

    w_emb, b_emb, layers = extract_params(
        params, module.n_layers, module.attention
    )
    per_layer = [
        [getattr(lp, f) for f in _W_FIELDS] for lp in layers
    ]
    return w_emb, b_emb, per_layer


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
        n_particles=module.n_particles,
        attention=module.attention,
        tanh=module.tanh,
        coords_range=module.coords_range / module.n_layers,
        cd=module.compute_dtype,
    )


def _round_up(v, m):
    return ((v + m - 1) // m) * m


def _prep_inputs(h0, x3, block_b):
    """Pad chains to the block size and particles to the sublane tile;
    coordinates go to (Bp, 3, Np) layout."""
    B, N, F = h0.shape
    Np = _round_up(N, 16)
    pad_b = (-B) % block_b
    h0p = jnp.pad(h0, ((0, pad_b), (0, Np - N), (0, 0)))
    xt = jnp.swapaxes(x3, 1, 2)  # (B, 3, N)
    xp = jnp.pad(xt, ((0, pad_b), (0, 0), (0, Np - N)))
    return h0p.astype(jnp.float32), xp.astype(jnp.float32), B + pad_b, Np


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda *g: (0,) * len(shape))


def _edge_attr_xla(xp):
    diff0 = xp[:, :, :, None] - xp[:, :, None, :]
    return jnp.sum(diff0 * diff0, axis=1)  # (Bp, Np, Np)


def _layer_fwd_call(h, x, ea, lw, static, block_b, interpret):
    Bp, Np, F = h.shape
    grid = (Bp // block_b,)
    kern = functools.partial(_layer_fwd_kernel, **static)
    blk = lambda *shape: pl.BlockSpec(
        (block_b,) + shape, lambda i: (i,) + (0,) * len(shape)
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            blk(Np, F), blk(3, Np), blk(Np, Np),
            *[_full_spec(w.shape) for w in lw],
        ],
        out_specs=[blk(Np, F), blk(3, Np)],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Np, F), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 3, Np), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(h, x, ea, *lw)


def _layer_bwd_call(h, x, ea, gh, gx, lw, static, block_b, interpret):
    Bp, Np, F = h.shape
    grid = (Bp // block_b,)
    kern = functools.partial(_layer_bwd_kernel, **static)
    blk = lambda *shape: pl.BlockSpec(
        (block_b,) + shape, lambda i: (i,) + (0,) * len(shape)
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            blk(Np, F), blk(3, Np), blk(Np, Np), blk(Np, F), blk(3, Np),
            *[_full_spec(w.shape) for w in lw],
        ],
        out_specs=[blk(Np, F), blk(3, Np), blk(Np, Np)],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Np, F), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 3, Np), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Np, Np), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(h, x, ea, gh, gx, *lw)


def _layer_tan_call(h, x, ea, xs0, basis, dh, dx, lw, static, tc, interpret):
    Bp, Np, F = h.shape
    Tc = basis.shape[0]
    grid = (Bp, Tc // tc)
    kern = functools.partial(_layer_tan_kernel, **static)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Np, F), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 3, Np), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, Np, Np), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 3, Np), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((tc, 3, Np), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, tc, Np, F), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, tc, 3, Np), lambda i, j: (i, j, 0, 0)),
            *[_full_spec(w.shape) for w in lw],
        ],
        out_specs=[
            pl.BlockSpec((1, tc, Np, F), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, tc, 3, Np), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Tc, Np, F), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Tc, 3, Np), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(h, x, ea, xs0, basis, dh, dx, *lw)


# ------------------------------------------------------------ public: forward


@functools.partial(
    jax.jit,
    static_argnames=("module", "block_b", "interpret"),
)
def egnn_forward_pallas(params, module, t, x_flat, beta,
                        block_b: int = 8, interpret: bool = False):
    """Fused EGNN forward; signature-compatible with egnn_fast.egnn_apply."""
    w_emb, b_emb, lws = _stacked_ws(params, module)
    N, D = module.n_particles, module.n_spatial_dim
    B = x_flat.shape[0]
    h0 = _embed_nodes(module, t, x_flat, beta) @ w_emb + b_emb  # (B, N, F)
    h, x, Bp, Np = _prep_inputs(h0, x_flat.reshape(B, N, D), block_b)
    xs = x
    ea = _edge_attr_xla(x)
    static = _static_cfg(module)
    for lw in lws:
        h, x = _layer_fwd_call(h, x, ea, lw, static, block_b, interpret)
    node_mask = (jnp.arange(Np) < N).astype(jnp.float32)
    vel = x - xs
    vel = vel - jnp.sum(vel * node_mask, axis=-1, keepdims=True) / N
    return jnp.swapaxes(vel[:B, :, :N], 1, 2).reshape(B, N * 3).astype(
        x_flat.dtype
    )


# ----------------------------------------------------- public: custom-VJP AD


_CORE_CACHE: dict = {}


def _get_layer_core(static_key, static, block_b, interpret):
    """Per-layer custom_vjp core (one per module config)."""
    key = (static_key, block_b, interpret)
    core = _CORE_CACHE.get(key)
    if core is not None:
        return core

    @jax.custom_vjp
    def core(h, x, ea, lw):
        return tuple(_layer_fwd_call(h, x, ea, lw, static, block_b, interpret))

    def fwd(h, x, ea, lw):
        return core(h, x, ea, lw), (h, x, ea, lw)

    def bwd(res, g):
        h, x, ea, lw = res
        gh, gx = g
        dh, dx, dea = _layer_bwd_call(
            h, x, ea, gh, gx, lw, static, block_b, interpret
        )
        # INFERENCE-ONLY: weights are constants (the sampler stop-gradients
        # its drift); training uses the XLA path.
        dlw = [jnp.zeros_like(w) for w in lw]
        return dh, dx, dea, dlw

    core.defvjp(fwd, bwd)
    _CORE_CACHE[key] = core
    return core


def egnn_forward_pallas_ad(params, module, t, x_flat, beta,
                           block_b: int = 8, interpret: bool = False):
    """Fused EGNN forward differentiable w.r.t. ``t``, ``x_flat``, ``beta``
    (NOT params — inference only) via fused per-layer backward kernels.

    The t/β dependence flows through the node embedding built here in XLA;
    the custom VJPs cover the layer bodies; the edge-attribute chain back to
    the coordinates is XLA (node/edge-scalar sized)."""
    w_emb, b_emb, lws = _stacked_ws(params, module)
    N, D = module.n_particles, module.n_spatial_dim
    B = x_flat.shape[0]
    static = _static_cfg(module)
    static_key = tuple(sorted((k, str(v)) for k, v in static.items()))
    core = _get_layer_core(static_key, static, block_b, interpret)
    Np = _round_up(N, 16)
    node_mask = (jnp.arange(Np) < N).astype(jnp.float32)

    h0 = _embed_nodes(module, t, x_flat, beta) @ w_emb + b_emb

    # pad the chain batch to the block size (zero rows are valid chains —
    # their outputs/cotangents are dropped on the slice below)
    pad_b = (-B) % block_b
    h0p = jnp.pad(h0, ((0, pad_b), (0, 0), (0, 0)))
    x3p = jnp.pad(x_flat.reshape(B, N, D), ((0, pad_b), (0, 0), (0, 0)))
    Bp = B + pad_b

    # differentiable end-to-end: layer bodies via custom_vjp, everything
    # node-sized (embeds, edge attrs, mean-free) in XLA
    h = jnp.pad(h0p, ((0, 0), (0, Np - N), (0, 0))).astype(jnp.float32)
    x = jnp.pad(
        jnp.swapaxes(x3p, 1, 2), ((0, 0), (0, 0), (0, Np - N))
    ).astype(jnp.float32)
    xs = x
    ea = _edge_attr_xla(x)
    for lw in lws:
        # weights explicitly non-differentiable: the layer core's custom VJP
        # covers (h, x, ea) only; stop_gradient makes the zero weight
        # cotangent the *declared* semantics rather than a silent wrong
        # answer if a params-differentiated caller ever reaches this path
        h, x = core(h, x, ea, [jax.lax.stop_gradient(w) for w in lw])
    vel = x - xs
    vel = vel - jnp.sum(vel * node_mask, axis=-1, keepdims=True) / N
    out = jnp.swapaxes(vel[:, :, :N], 1, 2).reshape(Bp, N * D)
    return out[:B].astype(x_flat.dtype)


def egnn_jacobian_trace_pallas(params, module, t, x_flat, beta,
                               block_b: int = 1, tangent_chunk: int = 8,
                               super_chunk: int = 64,
                               interpret: bool = False):
    """tr dF/dx of the EGNN backbone — fused per-layer tangent kernels.

    Exact forward-mode trace: the D = N·3 coordinate basis tangents run
    through each layer's linearized kernel in chunks (``tangent_chunk`` per
    kernel block; ``super_chunk`` tangents resident in HBM at a time).
    Returns (B,). ``block_b`` accepted for API stability (unused)."""
    del block_b
    w_emb, b_emb, lws = _stacked_ws(params, module)
    N, Dd = module.n_particles, module.n_spatial_dim
    B = x_flat.shape[0]
    D = N * Dd
    static = _static_cfg(module)
    tc = tangent_chunk

    h0 = _embed_nodes(module, t, x_flat, beta) @ w_emb + b_emb
    h, x, Bp, Np = _prep_inputs(h0, x_flat.reshape(B, N, Dd), 8)
    xs = x
    ea = _edge_attr_xla(x)

    # primal forward, keeping each layer's INPUT state
    states = []
    for lw in lws:
        states.append((h, x))
        h, x = _layer_fwd_call(h, x, ea, lw, static, 8, interpret)

    # coordinate-basis one-hots in the (3, Np) layout: tangent d = (n, dim)
    # sits at [dim, n]
    Tc = super_chunk
    n_super = (D + Tc - 1) // Tc
    Tc_pad = _round_up(min(Tc, D), tc)

    dim_iota = jax.lax.broadcasted_iota(jnp.int32, (Tc_pad, 3, Np), 1)
    n_iota = jax.lax.broadcasted_iota(jnp.int32, (Tc_pad, 3, Np), 2)
    flat_pos = n_iota * 3 + dim_iota
    t_off = jax.lax.broadcasted_iota(jnp.int32, (Tc_pad, 3, Np), 0)

    trace = jnp.zeros((Bp,), jnp.float32)
    node_mask = (jnp.arange(Np) < N).astype(jnp.float32)
    for s in range(n_super):
        t_idx = t_off + s * Tc
        basis = jnp.where(
            (t_idx == flat_pos) & (t_idx < D), 1.0, 0.0
        )  # (Tc_pad, 3, Np)
        dh = jnp.zeros((Bp, Tc_pad, Np, h.shape[-1]), jnp.float32)
        dx = jnp.broadcast_to(basis[None], (Bp, Tc_pad, 3, Np))
        for lw, (h_l, x_l) in zip(lws, states):
            dh, dx = _layer_tan_call(
                h_l, x_l, ea, xs, basis, dh, dx, lw, static, tc, interpret
            )
        dvel = dx - basis[None]
        dvel = dvel - (
            jnp.sum(dvel * node_mask, axis=-1, keepdims=True) / N
        ) * node_mask
        trace = trace + jnp.sum(dvel * basis[None], axis=(1, 2, 3))
    return trace[:B]
