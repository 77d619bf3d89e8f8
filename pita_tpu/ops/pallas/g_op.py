"""Pallas TPU kernel: G-operator tangent contraction for the exact divergence.

The edge-operator exact divergence (nets/egnn_fast.py) spends its time in

    t2[t,b,n,g] = Σ_{m,f} G[b,n,m,f,g] · Bv[t,b,m,f]

where the per-edge operator G = mask·(att·D(sp1)·W2·D(sp2) + (s_att·q)⊗m_pre)
is built from primal activations. The XLA path materializes G — a
(B, N, N, F, F) tensor, ~0.4 GB per layer per 64-chain block on LJ55 — in
HBM and reads it back for the contraction: the exact mode is bound on that
traffic (PERF.md round-2 post-mortem; the round-3 design sketched there).

This kernel never materializes G. Per grid cell (one chain, a block of RB
receiver rows) it:

1. loads the row's primal edge activations (sp1/sp2/att·mask/satq/m_pre —
   (RB, N, F) tiles, ~100 KB) and the chain's full tangent panel
   Bv (N·F, T) once into VMEM;
2. builds the G row-block (RB·F, N·F) in registers/VMEM from the primals
   (~2% of the matmul FLOPs, VPU);
3. contracts it against the tangent panel on the MXU:
   (RB·F, N·F) @ (N·F, T) with RB·F = 128 sublanes — an MXU-shaped matmul.

HBM traffic per cell: primal rows + one shared tangent panel — the
(B, N², F²) object never exists. FLOPs are identical to the einsum.

Index convention matches ``egnn_fast._layer_tangent_ops``: G[f_in, g_out],
``satq = s_att · q`` with q = sp1 ⊙ (W2 @ (sp2 ⊙ w_att)) computed by the
caller in XLA ((B, N², F)-sized, cheap).

Layouts follow the round-2 rules (ops/pallas/egnn_fwd.py): particle axis
padded to a multiple of 16, f32 elementwise, bf16 matmul inputs with f32
accumulation.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 100 * 1024 * 1024


def _round_up(v, m):
    return -(-v // m) * m


def _kernel(sp1_ref, sp2_ref, attm_ref, satq_ref, mpre_ref, w2_ref, bv_ref,
            out_ref, *, RB, Np, F, T):
    """One chain, RB receiver rows.

    Block shapes (leading chain axis blocked to 1):
      sp1/sp2/satq/mpre: (1, RB, Np, F) f32   attm: (1, RB, Np) f32
      w2: (F, F) f32                          bv: (1, Np * F, T) bf16
      out: (1, RB * F, T) f32
    """
    w2 = w2_ref[...]  # (F, F)
    bv = bv_ref[0]  # (Np*F, T) bf16

    for r in range(RB):  # static unroll: RB is small (2-4)
        sp1 = sp1_ref[0, r]  # (Np, F)
        sp2 = sp2_ref[0, r]
        attm = attm_ref[0, r]  # (Np,)
        satq = satq_ref[0, r]
        mpre = mpre_ref[0, r]
        # build the G row as (Np, F_in, F_out):
        #   att·sp1[m,f]·W2[f,g]·sp2[m,g] + satq[m,f]·m_pre[m,g]
        t1 = (attm[:, None] * sp1)[:, :, None] * w2[None] * sp2[:, None, :]
        t2 = satq[:, :, None] * mpre[:, None, :]
        g_row = t1 + t2  # (Np, F_in, F_out)
        # contraction index is (m, f_in). Collapse the two LEADING dims —
        # a layout-preserving shape cast (minor/lane dim F_out untouched;
        # Mosaic rejects the transposed form (F, Np·F), which would merge
        # axes into lanes: "infer-vector-layout: unsupported shape cast",
        # observed on v5e) — and contract over the leading axis instead.
        g_mat = g_row.reshape(Np * F, F)  # (Np·F_in, F_out)
        acc = jax.lax.dot_general(
            g_mat.astype(jnp.bfloat16), bv,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (F_out, T)
        out_ref[0, r * F:(r + 1) * F, :] = acc


@functools.partial(
    jax.jit,
    static_argnames=("rows_per_block", "interpret"),
)
def g_operator_contract(sp1, sp2, att_mask, satq, m_pre, w2, bv,
                        rows_per_block: int = 4, interpret: bool = False):
    """t2[t,b,n,g] = Σ_{m,f} G[b,n,m,f,g]·bv[t,b,m,f] without materializing G.

    Args:
      sp1, sp2, satq, m_pre: (B, N, N, F) f32 primal edge activations.
      att_mask: (B, N, N) f32 — attention gate with the edge mask folded in
        (0 on masked edges; the satq/m_pre term must also be pre-masked by
        the caller via satq ← satq·mask).
      w2: (F, F).
      bv: (T, B, N, F) tangent node features.
    Returns:
      (T, B, N, F) f32.
    """
    B, N, _, F = sp1.shape
    T = bv.shape[0]
    # TPU block shapes need the sublane (second-minor) dim divisible by 8;
    # the receiver-rows axis is the sublane dim of the (1, RB, Np) att block.
    RB = _round_up(rows_per_block, 8)
    Np = _round_up(N, 16)
    Nr = _round_up(N, RB)
    pad_rows = Nr - N
    pad_cols = Np - N

    def pad_e(a):  # (B, N, N, F) -> (B, Nr, Np, F)
        return jnp.pad(a, ((0, 0), (0, pad_rows), (0, pad_cols), (0, 0)))

    sp1p = pad_e(sp1.astype(jnp.float32))
    sp2p = pad_e(sp2.astype(jnp.float32))
    satqp = pad_e(satq.astype(jnp.float32))
    mprep = pad_e(m_pre.astype(jnp.float32))
    attp = jnp.pad(
        att_mask.astype(jnp.float32), ((0, 0), (0, pad_rows), (0, pad_cols))
    )
    # tangent panel: (T, B, N, F) -> (B, Np*F, T); padded senders contribute 0
    # because att_mask/satq are 0 on padded columns
    bvp = jnp.pad(bv, ((0, 0), (0, 0), (0, pad_cols), (0, 0)))
    bv_panel = jnp.transpose(
        bvp.reshape(T, B, Np * F), (1, 2, 0)
    ).astype(jnp.bfloat16)

    grid = (B, Nr // RB)
    out = pl.pallas_call(
        functools.partial(_kernel, RB=RB, Np=Np, F=F, T=T),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, RB, Np, F), lambda b, r: (b, r, 0, 0)),
            pl.BlockSpec((1, RB, Np, F), lambda b, r: (b, r, 0, 0)),
            pl.BlockSpec((1, RB, Np), lambda b, r: (b, r, 0)),
            pl.BlockSpec((1, RB, Np, F), lambda b, r: (b, r, 0, 0)),
            pl.BlockSpec((1, RB, Np, F), lambda b, r: (b, r, 0, 0)),
            pl.BlockSpec((F, F), lambda b, r: (0, 0)),
            pl.BlockSpec((1, Np * F, T), lambda b, r: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, RB * F, T), lambda b, r: (b, r, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Nr * F, T), jnp.float32),
        interpret=interpret,
        **(
            {}
            if interpret
            else {"compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT)}
        ),
    )(sp1p, sp2p, attp, satqp, mprep, w2.astype(jnp.float32), bv_panel)
    # (B, Nr*F, T) -> (T, B, N, F)
    out = out.reshape(B, Nr, F, T)[:, :N]
    return jnp.transpose(out, (3, 0, 1, 2))
