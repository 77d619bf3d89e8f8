"""Pallas TPU kernel: fused EGNN backbone forward.

The XLA EGNN forward materializes ~6 (B, N², F) edge tensors per layer in
HBM; the whole-network fused kernel keeps every edge intermediate in VMEM —
HBM traffic collapses to the (B, N·F) node state and weights. Used on the
sampler's score path (no AD required: the integrator stop-gradients its
drift); training and the energy-gradient path keep the XLA forward.

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


def _silu(z):
    return z * (1.0 / (1.0 + jnp.exp(-z)))


def _kernel(
    # inputs
    h0_ref, x_ref,
    w_src_ref, b_src_ref, w_dst_ref, w_scal_ref, w_e2_ref, b_e2_ref,
    w_att_ref, b_att_ref, w_c1_ref, b_c1_ref, w_c2_ref,
    w_n1_ref, b_n1_ref, w_n2_ref, b_n2_ref,
    # outputs
    out_ref,
    *, n_layers: int, n_particles: int, attention: bool, tanh: bool,
    coords_range: float, cd,
):
    N = n_particles
    h = h0_ref[...].astype(cd)  # (bb, N, F)
    xs = x_ref[...].astype(jnp.float32)  # (bb, N, 3)
    bb = h.shape[0]
    F = h.shape[-1]
    eye = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0) == jax.lax.broadcasted_iota(
        jnp.int32, (N, N), 1
    )
    mask = jnp.where(eye, 0.0, 1.0)

    def pair_radial(x):
        diff = x[:, :, None, :] - x[:, None, :, :]
        return diff, jnp.sum(diff * diff, axis=-1)

    _, edge_attr = pair_radial(xs)
    xc = xs
    for l in range(n_layers):
        diff, radial = pair_radial(xc)
        norm = jnp.sqrt(radial + 1e-8)
        denom = norm + 1.0

        src = h @ w_src_ref[l].astype(cd) + b_src_ref[l].astype(cd)
        dst = h @ w_dst_ref[l].astype(cd)
        scal = (
            radial[..., None].astype(cd) * w_scal_ref[l, 0].astype(cd)
            + edge_attr[..., None].astype(cd) * w_scal_ref[l, 1].astype(cd)
        )
        z1 = src[:, :, None, :] + dst[:, None, :, :] + scal
        m1 = _silu(z1)
        # (bb·N·N, F) @ (F, F) on the MXU
        z2 = (
            m1.reshape(bb * N * N, F) @ w_e2_ref[l].astype(cd)
        ).reshape(bb, N, N, F) + b_e2_ref[l].astype(cd)
        m = _silu(z2)
        if attention:
            att = jax.nn.sigmoid(
                (m.reshape(bb * N * N, F) @ w_att_ref[l].astype(cd)).reshape(
                    bb, N, N
                )
                + b_att_ref[l, 0].astype(cd)
            )
        else:
            att = jnp.ones((bb, N, N), cd)
        m = m * (att * mask.astype(cd))[..., None]

        cz = (
            m.reshape(bb * N * N, F) @ w_c1_ref[l].astype(cd)
        ).reshape(bb, N, N, F) + b_c1_ref[l].astype(cd)
        c1 = _silu(cz)
        cm = (
            c1.reshape(bb * N * N, F) @ w_c2_ref[l].astype(cd)
        ).reshape(bb, N, N).astype(jnp.float32)
        a = jnp.tanh(cm) * coords_range if tanh else cm
        a = a * mask
        w = a / denom
        xc = (
            xc
            + xc * jnp.sum(w, axis=2)[..., None]
            - jnp.einsum("bnm,bmd->bnd", w, xc)
        )

        agg = jnp.sum(m, axis=2)
        node_in = jnp.concatenate([h, agg], axis=-1)
        nz = node_in @ w_n1_ref[l].astype(cd) + b_n1_ref[l].astype(cd)
        out = _silu(nz) @ w_n2_ref[l].astype(cd)
        h = h + out + b_n2_ref[l].astype(cd)

    vel = xc - xs
    vel = vel - jnp.mean(vel, axis=1, keepdims=True)
    out_ref[...] = vel.reshape(bb, N * 3).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("module", "block_b", "interpret"),
)
def egnn_forward_pallas(params, module, t, x_flat, beta,
                        block_b: int = 8, interpret: bool = False):
    """Fused EGNN forward; signature-compatible with egnn_fast.egnn_apply."""
    from pita_tpu.nets.egnn_fast import extract_params

    w_emb, b_emb, layers = extract_params(
        params, module.n_layers, module.attention
    )
    B = x_flat.shape[0]
    N, D = module.n_particles, module.n_spatial_dim
    cd = module.compute_dtype

    # node embedding on the host side of the kernel (tiny)
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
    h0 = jnp.concatenate(feats, axis=-1) @ w_emb + b_emb  # (B, N, F)

    stack = lambda fld: jnp.stack([getattr(lp, fld) for lp in layers])
    ws = [
        stack("w_src"), stack("b_src"), stack("w_dst"), stack("w_scal"),
        stack("w_e2"), stack("b_e2"), stack("w_att"), stack("b_att"),
        stack("w_c1"), stack("b_c1"), stack("w_c2"),
        stack("w_n1"), stack("b_n1"), stack("w_n2"), stack("b_n2"),
    ]

    pad = (-B) % block_b
    h0p = jnp.pad(h0, ((0, pad), (0, 0), (0, 0)))
    xp = jnp.pad(x_flat.reshape(B, N, D), ((0, pad), (0, 0), (0, 0)))
    Bp = B + pad
    grid = (Bp // block_b,)

    kern = functools.partial(
        _kernel,
        n_layers=module.n_layers, n_particles=N,
        attention=module.attention, tanh=module.tanh,
        coords_range=module.coords_range / module.n_layers, cd=cd,
    )
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, N, h0.shape[-1]), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, N, D), lambda i: (i, 0, 0)),
            *[full(w.shape) for w in ws],
        ],
        out_specs=pl.BlockSpec((block_b, N * D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, N * D), x_flat.dtype),
        interpret=interpret,
    )(h0p, xp, *ws)
    return out[:B]
