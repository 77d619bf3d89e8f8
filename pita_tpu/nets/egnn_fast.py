"""Fast exact score-divergence for the EGNN backbone (the FK hot object).

Reference parity: the exact score-Jacobian trace of ``sdes.py:199-203`` /
``utils.py:30-40`` — the dominant cost of debiased FK sampling. The naive
forward-mode trace propagates D = N·3 tangents through the network, and every
tangent materializes (N², F) edge activations: the computation is HBM-bound on
(T, B, N², F) tensors (measured: >100 GB of tangent traffic per LJ55 batch).

TPU-first design — **edge-operator factorization**. Per layer, the tangent
map of the edge MLP chain is linear in the per-edge pre-activation tangent
``d_z1``; its composition is a per-edge F×F operator built from *primal*
activations only:

    d_m_ij  = G_ij · d_z1_ij,      G_ij = [att·I + σ'att·m⊗w_att] D(σ'₂) W₂ᵀ D(σ'₁)
    d_cm_ij = r_ij · d_z1_ij,      r_ij = G̃_ijᵀ (W_c1 (σ'_cz ⊙ w_c2))

and ``d_z1`` itself is node-factored plus edge-scalar terms:

    d_z1_ij = A_i + B_j + c_ij·w_r + e_ij·w_e
    (A = dh·W_src, B = dh·W_dst, c = d‖x_i−x_j‖², e = d(edge_attr))

so the tangent batch never touches (T, N², F) tensors: the whole per-layer
edge propagation for ALL tangents collapses to one dense
``(N·F, N·F) @ (N·F, T)`` matmul per chain (the ``Σ_j G_ij B_j`` term) plus
node-level and (N², T)-scalar contractions. Geometry is likewise factorized —
pairwise radials via ‖x_i‖² + ‖x_j‖² − 2·x·xᵀ and coordinate updates via
row-sum + (N, N)@(N, 3) matmuls — so no (B, N, N, 3) tensor exists anywhere.

The result is an *exact* Jacobian trace (same math as jacfwd, different
association order) at a fraction of the FLOPs-per-byte cost: per chain and
layer, one MXU-shaped matmul instead of 165 bandwidth-bound edge-MLP passes.

All functions consume the unchanged flax ``EGNNBackbone`` parameter tree.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


def _silu(z):
    return z * jax.nn.sigmoid(z)


def _silu_prime(z):
    s = jax.nn.sigmoid(z)
    return s * (1 + z * (1 - s))


class _LayerParams(NamedTuple):
    w_src: jnp.ndarray
    b_src: jnp.ndarray
    w_dst: jnp.ndarray
    w_scal: jnp.ndarray  # (2, F): rows = [radial, edge_attr]
    w_e2: jnp.ndarray
    b_e2: jnp.ndarray
    w_att: jnp.ndarray  # (F, 1)
    b_att: jnp.ndarray
    w_c1: jnp.ndarray
    b_c1: jnp.ndarray
    w_c2: jnp.ndarray  # (F, 1)
    w_n1: jnp.ndarray  # (2F, F)
    b_n1: jnp.ndarray
    w_n2: jnp.ndarray
    b_n2: jnp.ndarray


def extract_params(params, n_layers: int, attention: bool = True):
    """Pull the EGNNBackbone flax tree into flat per-layer tuples.

    Flax auto-numbers Dense submodules in call order; with ``attention=False``
    the EGCL skips its attention Dense, shifting subsequent indices by one.
    """
    p = params["params"]
    emb = p["Dense_0"]
    off = 0 if attention else -1
    layers = []
    for l in range(n_layers):
        q = p[f"EGCL_{l}"]
        if attention:
            w_att, b_att = q["Dense_4"]["kernel"], q["Dense_4"]["bias"]
        else:
            F = q["Dense_3"]["kernel"].shape[1]
            w_att = jnp.zeros((F, 1), q["Dense_3"]["kernel"].dtype)
            b_att = jnp.zeros((1,), q["Dense_3"]["kernel"].dtype)
        layers.append(
            _LayerParams(
                w_src=q["Dense_0"]["kernel"], b_src=q["Dense_0"]["bias"],
                w_dst=q["Dense_1"]["kernel"],
                w_scal=q["Dense_2"]["kernel"],
                w_e2=q["Dense_3"]["kernel"], b_e2=q["Dense_3"]["bias"],
                w_att=w_att, b_att=b_att,
                w_c1=q[f"Dense_{5 + off}"]["kernel"], b_c1=q[f"Dense_{5 + off}"]["bias"],
                w_c2=q[f"Dense_{6 + off}"]["kernel"],
                w_n1=q[f"Dense_{7 + off}"]["kernel"], b_n1=q[f"Dense_{7 + off}"]["bias"],
                w_n2=q[f"Dense_{8 + off}"]["kernel"], b_n2=q[f"Dense_{8 + off}"]["bias"],
            )
        )
    return emb["kernel"], emb["bias"], layers


def _pair_diff_radial(x):
    """(diff, ‖x_i − x_j‖²); diff: (B, N, N, 3) — computed directly (the
    inner-product identity ‖xi‖²+‖xj‖²−2x·xᵀ cancels catastrophically for
    close pairs and the error is amplified by 1/norm in the tangents)."""
    diff = x[:, :, None, :] - x[:, None, :, :]
    return diff, jnp.sum(diff * diff, axis=-1)


class _LayerActs(NamedTuple):
    """Primal activations one EGCL layer needs for its tangent operators."""

    x_in: jnp.ndarray  # (B, N, 3) layer input coords
    diff: jnp.ndarray  # (B, N, N, 3) pairwise differences of x_in
    h_in: jnp.ndarray  # (B, N, F) layer input node features
    norm: jnp.ndarray  # (B, N, N)
    sp1: jnp.ndarray  # silu'(z1)
    sp2: jnp.ndarray  # silu'(z2)
    m_pre: jnp.ndarray  # silu(z2) before attention
    att: jnp.ndarray  # (B, N, N)
    sp_cz: jnp.ndarray  # silu'(cz)
    cm: jnp.ndarray  # (B, N, N) coord-MLP scalar output
    w: jnp.ndarray  # (B, N, N) masked a/(norm+1) coordinate weights
    sp_n: jnp.ndarray  # (B, N, F) silu'(node hidden)


def _layer_forward(lp: _LayerParams, h, x, edge_attr, mask, coords_range,
                   attention, tanh, recurrent, cd):
    """Factorized-geometry EGCL forward. Returns (h_out, x_out, acts)."""
    B, N, F = h.shape
    diff, radial = _pair_diff_radial(x)
    norm = jnp.sqrt(radial + 1e-8)
    denom = norm + 1.0

    hc = h.astype(cd)
    src = hc @ lp.w_src.astype(cd) + lp.b_src.astype(cd)
    dst = hc @ lp.w_dst.astype(cd)
    scal = (
        radial[..., None].astype(cd) * lp.w_scal[0].astype(cd)
        + edge_attr[..., None].astype(cd) * lp.w_scal[1].astype(cd)
    )
    z1 = src[:, :, None, :] + dst[:, None, :, :] + scal
    m1 = _silu(z1)
    z2 = m1 @ lp.w_e2.astype(cd) + lp.b_e2.astype(cd)
    m_pre = _silu(z2)
    if attention:
        att = jax.nn.sigmoid(
            (m_pre @ lp.w_att.astype(cd))[..., 0] + lp.b_att.astype(cd)[0]
        )
    else:
        att = jnp.ones_like(z2[..., 0])
    m = m_pre * (att * mask)[..., None]

    cz = m @ lp.w_c1.astype(cd) + lp.b_c1.astype(cd)
    c1 = _silu(cz)
    cm = (c1 @ lp.w_c2.astype(cd))[..., 0].astype(jnp.float32)
    if tanh:
        a = jnp.tanh(cm) * coords_range
    else:
        a = cm
    a = a * mask
    w = a / denom
    # Σ_j (x_i − x_j)/(norm+1) · a_ij  =  x_i·rowsum(w) − w @ x
    x_out = x + x * jnp.sum(w, axis=2)[..., None] - jnp.einsum("bnm,bmd->bnd", w, x)

    agg = jnp.sum(m, axis=2)
    node_in = jnp.concatenate([hc, agg], axis=-1)
    nz = node_in @ lp.w_n1.astype(cd) + lp.b_n1.astype(cd)
    n1 = _silu(nz)
    out = (n1 @ lp.w_n2.astype(cd) + lp.b_n2.astype(cd)).astype(h.dtype)
    h_out = h + out if recurrent else out

    acts = _LayerActs(
        x_in=x, diff=diff, h_in=hc, norm=norm,
        sp1=_silu_prime(z1), sp2=_silu_prime(z2), m_pre=m_pre, att=att,
        sp_cz=_silu_prime(cz), cm=cm, w=w,
        sp_n=_silu_prime(nz),
    )
    return h_out, x_out, acts


def egnn_apply(params, module, t, x_flat, beta, with_acts: bool = False):
    """Forward of ``EGNNBackbone`` from its param tree, factorized geometry.

    Matches ``EGNNBackbone.__call__`` (nets/egnn.py) up to float reassociation.
    module: the EGNNBackbone instance (for static config fields).
    """
    w_emb, b_emb, layers = extract_params(params, module.n_layers, module.attention)
    B = x_flat.shape[0]
    N, D = module.n_particles, module.n_spatial_dim
    cd = module.compute_dtype
    xs = x_flat.reshape(B, N, D)
    t = jnp.broadcast_to(jnp.asarray(t, x_flat.dtype).reshape(-1), (B,))
    feats = [jnp.broadcast_to(t[:, None, None], (B, N, 1))]
    if module.condition_on_temperature:
        bb = jnp.broadcast_to(jnp.asarray(beta, x_flat.dtype).reshape(-1), (B,))
        feats.append(jnp.broadcast_to(bb[:, None, None], (B, N, 1)))
    if module.atom_types is not None:
        onehot = jax.nn.one_hot(
            jnp.asarray(module.atom_types),
            int(max(module.atom_types)) + 1,
            dtype=x_flat.dtype,
        )
        feats.append(jnp.broadcast_to(onehot[None], (B, N, onehot.shape[-1])))
    h = jnp.concatenate(feats, axis=-1) @ w_emb + b_emb

    diff0, edge_attr = _pair_diff_radial(xs)
    mask = 1.0 - jnp.eye(N, dtype=jnp.float32)
    coords_range = module.coords_range / module.n_layers

    xc = xs
    all_acts = []
    for lp in layers:
        h, xc, acts = _layer_forward(
            lp, h, xc, edge_attr, mask, coords_range,
            module.attention, module.tanh, getattr(module, "recurrent", True), cd,
        )
        all_acts.append(acts)

    vel = xc - xs
    vel = vel - jnp.mean(vel, axis=1, keepdims=True)
    out = vel.reshape(B, N * D)
    if with_acts:
        return out, (edge_attr, diff0, mask, coords_range, layers, all_acts, xs)
    return out


# --------------------------------------------------------------------------
# exact Jacobian trace via edge-operator factorization
# --------------------------------------------------------------------------


def _layer_tangent_ops(lp: _LayerParams, acts: _LayerActs, diff0, mask,
                       coords_range, attention, tanh, cd,
                       materialize_g: bool = True):
    """Tangent-independent per-edge operators of one layer.

    Phase-2 factorization: beyond the edge operators

        G: (B,N,N,F,F)  d_m  = G·d_z1      (mask folded in)
        r: (B,N,N,F)    d_a  = r·d_z1      (tanh'·mask folded in)

    every tangent contraction the layer needs is pre-contracted against the
    *primal* geometry, so the tangent batch only ever touches node-sized
    tensors and (N·F / N·3)-K matmuls — no (T, B, N², ·) tensor exists:

      d_agg  = P·A + G·B + [UD·dxc − UD2·dxc] + [VD·dxs − VD2·dxs]
      row_dw = RS·A + ř·B + [QC1·dxc − QCD·dxc] + [QE1·dxs − QED·dxs]
      y=d_w@x= RX·A + RX2·B + [QCX1·dxc − QCXD·dxc] + [QEX1·dxs − QEXD·dxs]

    with d_z1 = A_i + B_j + c_ij·w_r + e_ij·w_e, c = 2·diff·(dxc_i − dxc_j),
    e = 2·diff0·(dxs_i − dxs_j), d_w = (d_a − w·d_norm)/denom and
    d_norm = c/(2·norm) (the w·d_norm piece is folded into the c-operators
    via q_c = r·w_r/denom − w/(2·norm·denom)).
    """
    w2 = lp.w_e2.astype(cd)
    maskc = mask.astype(cd)
    if materialize_g:
        # base K = D(sp1) W2 D(sp2): K[f,g] = sp1[f] · W2[f,g] · sp2[g]
        K = (
            acts.sp1[..., :, None]
            * w2[None, None, None]
            * acts.sp2[..., None, :]
        )  # (B,N,N,F,F)
        if attention:
            # d_m = att·d_m_pre + m_pre (x) (s_att · w_att^T d_m_pre)
            s_att = (acts.att * (1 - acts.att))[..., None]
            q = K @ lp.w_att.astype(cd)  # (B,N,N,F,1)
            # rank-1 term [f_in, f_out] = (s_att·q)[f_in] · m_pre[f_out]
            G = acts.att[..., None, None] * K + (
                (q * s_att[..., None]) @ acts.m_pre[..., None, :]
            )
        else:
            G = K
        G = G * mask[None, :, :, None, None].astype(cd)

        # r = G·chat where chat = W_c1 (sp_cz ⊙ w_c2), tanh'·mask folded
        chat = (acts.sp_cz * lp.w_c2.astype(cd)[:, 0]) @ lp.w_c1.astype(cd).T
        r = jnp.einsum("bnmfg,bnmg->bnmf", G, chat)
    else:
        # G never materialized (the Pallas G-operator kernel contracts the
        # tangents, ops/pallas/g_op.py): every G-contraction with a FIXED
        # vector factors through the rank structure
        #   G[f,g] = att·mask·sp1[f]·W2[f,g]·sp2[g] + mask·satq[f]·m_pre[g]
        if attention:
            s_att = acts.att * (1 - acts.att)  # (B,N,N)
            # q[f] = sp1[f] · (W2 @ (sp2 ⊙ w_att))[f]
            q = acts.sp1 * ((acts.sp2 * lp.w_att.astype(cd)[:, 0]) @ w2.T)
            att_eff = acts.att
            satq = s_att[..., None] * q
        else:
            att_eff = jnp.ones_like(acts.norm).astype(cd)
            satq = jnp.zeros_like(acts.sp1)
        att_mask = att_eff * maskc
        satq_m = satq * maskc[None, :, :, None]
        G = dict(
            sp1=acts.sp1, sp2=acts.sp2, att_mask=att_mask, satq=satq_m,
            m_pre=acts.m_pre, w2=w2,
        )
        chat = (acts.sp_cz * lp.w_c2.astype(cd)[:, 0]) @ lp.w_c1.astype(cd).T
        # r[f] = Σ_g G[f,g]·chat[g]
        r = (
            att_mask[..., None] * acts.sp1
            * ((acts.sp2 * chat) @ w2.T)
            + satq_m * jnp.sum(acts.m_pre * chat, axis=-1, keepdims=True)
        )
    if tanh:
        dtanh = (1.0 - jnp.tanh(acts.cm) ** 2) * coords_range
    else:
        dtanh = jnp.ones_like(acts.cm)
    r = r * (dtanh * mask)[..., None].astype(cd)

    norm = acts.norm
    denom = (norm + 1.0).astype(jnp.float32)
    w = acts.w
    x = acts.x_in  # (B,N,3)
    diff = acts.diff.astype(cd)
    d0 = diff0.astype(cd)

    # d_agg operators
    if materialize_g:
        P = jnp.sum(G, axis=2)  # (B,N,F,F)
        u = jnp.einsum("bnmfg,f->bnmg", G, lp.w_scal[0].astype(cd))
        v = jnp.einsum("bnmfg,f->bnmg", G, lp.w_scal[1].astype(cd))
    else:
        asp1 = att_mask[..., None] * acts.sp1

        def g_dot_left(w):  # Σ_f G[f,g]·w[f] per edge
            return (
                att_mask[..., None] * acts.sp2 * ((acts.sp1 * w) @ w2)
                + (satq_m @ w)[..., None] * acts.m_pre
            )

        u = g_dot_left(lp.w_scal[0].astype(cd))
        v = g_dot_left(lp.w_scal[1].astype(cd))
        P = (
            w2[None, None] * jnp.einsum("bnmf,bnmg->bnfg", asp1, acts.sp2)
            + jnp.einsum("bnmf,bnmg->bnfg", satq_m, acts.m_pre)
        )
    UD = jnp.einsum("bnmg,bnmd->bngd", u, diff)
    UD2 = u[..., None] * diff[..., None, :]  # (B,N,N,F,3)
    VD = jnp.einsum("bnmg,bnmd->bngd", v, d0)
    VD2 = v[..., None] * d0[..., None, :]

    # coordinate-path scalar operators: q_c/q_e fold the d_a and -w·d_norm
    # pieces of d_w (both proportional to c)
    rc = jnp.einsum("bnmf,f->bnm", r, lp.w_scal[0].astype(cd)).astype(jnp.float32)
    re = jnp.einsum("bnmf,f->bnm", r, lp.w_scal[1].astype(cd)).astype(jnp.float32)
    q_c = (rc / denom - w / (2 * norm * denom)).astype(cd)
    q_e = (re / denom).astype(cd)
    rdiv = r / denom[..., None].astype(cd)

    RS = jnp.sum(rdiv, axis=2)  # (B,N,F)
    xc16 = x.astype(cd)
    RX = jnp.einsum("bnmf,bmd->bnfd", rdiv, xc16)
    RX2 = rdiv[..., None] * xc16[:, None, :, None, :]  # (B,N,N,F,3)
    QC1 = jnp.einsum("bnm,bnmd->bnd", q_c, diff)
    QCD = q_c[..., None] * diff  # (B,N,N,3)
    QE1 = jnp.einsum("bnm,bnmd->bnd", q_e, d0)
    QED = q_e[..., None] * d0
    QCX1 = jnp.einsum("bnmd,bmq->bndq", QCD, xc16)
    QCXD = QCD[..., None] * xc16[:, None, :, None, :]  # (B,N,N,3,3)
    QEX1 = jnp.einsum("bnmd,bmq->bndq", QED, xc16)
    QEXD = QED[..., None] * xc16[:, None, :, None, :]
    return dict(
        G=G, P=P, RS=RS, rdiv=rdiv, RX=RX, RX2=RX2,
        UD=UD, UD2=UD2, VD=VD, VD2=VD2,
        QC1=QC1, QCD=QCD, QE1=QE1, QED=QED,
        QCX1=QCX1, QCXD=QCXD, QEX1=QEX1, QEXD=QEXD,
    )


def egnn_jacobian_trace(params, module, t, x_flat, beta, tangent_chunk: int = None,
                        g_kernel: bool = False, g_kernel_interpret: bool = False,
                        g_rows_per_block: int = 4):
    """(F(x), tr dF/dx) for the EGNN backbone — exact, edge-operator method.

    Propagates the full D-dimensional tangent basis with per-edge linear
    operators precomputed from one primal pass; equivalent to
    ``jacfwd``-trace (ops/divergence.py:exact_divergence) with O(1) primal
    passes, no (T, N², ·) tensors, and the input-basis (``dxs``) contractions
    resolved as gathers (the basis is one-hot: contracting an operator with
    dxs just indexes it at (p, eps) = divmod(tangent_index, 3)).
    """
    B = x_flat.shape[0]
    N, D = module.n_particles, module.n_spatial_dim
    dim = N * D
    cd = module.compute_dtype

    out, (edge_attr, diff0, mask, coords_range, layers, all_acts, xs) = egnn_apply(
        params, module, t, x_flat, beta, with_acts=True
    )

    ops = [
        _layer_tangent_ops(lp, acts, diff0, mask, coords_range,
                           module.attention, module.tanh, cd,
                           materialize_g=not g_kernel)
        for lp, acts in zip(layers, all_acts)
    ]

    T_all = dim
    chunk = tangent_chunk or T_all

    def run_chunk(tangent_idx):
        """tangent_idx: (Tc,) flat coordinate indices; returns (Tc, B) diag."""
        Tc = tangent_idx.shape[0]
        p_idx = tangent_idx // D  # particle of each basis tangent
        e_idx = tangent_idx % D  # spatial component

        def gather_edge(op):
            """contract op[b,n,m,...,d] with the one-hot dxs over (m,d):
            -> op[b,n,p_t,...,e_t], advanced-index dims moved to front."""
            return op[:, :, p_idx, ..., e_idx]  # (Tc,B,N,...)

        def gather_node(op):
            """contract op[b,n,...,d] with dxs over d at n==p_t:
            -> op[b,n,...,e_t] masked to n==p_t."""
            g = jnp.moveaxis(op[..., e_idx], -1, 0)  # (Tc,B,N,...)
            node_mask = (jnp.arange(N)[None] == p_idx[:, None]).astype(g.dtype)
            extra = (1,) * (g.ndim - 3)
            return g * node_mask.reshape(Tc, 1, N, *extra)

        dh = jnp.zeros((Tc, B, N, layers[0].w_src.shape[0]), cd)
        # dxc starts as the basis itself
        basis = jax.nn.one_hot(tangent_idx, dim, dtype=jnp.float32)
        dxs = jnp.broadcast_to(basis.reshape(Tc, 1, N, D), (Tc, B, N, D))
        dxc = dxs

        for li, (lp, acts, op) in enumerate(zip(layers, all_acts, ops)):
            A = dh @ lp.w_src.astype(cd)  # (T,B,N,F)
            Bv = dh @ lp.w_dst.astype(cd)
            dxc16 = dxc.astype(cd)
            first = li == 0  # dxc == dxs: reuse the gather path for c-terms

            # --- d_agg = P·A + G·B + c-terms + e-terms
            t1 = jnp.einsum("bnfg,tbnf->tbng", op["P"], A)
            # the dominant contraction: (N·F, N·F) @ (N·F, T) per chain
            if first:
                # dh is zero at the first layer: A = Bv = 0, so t2 ≡ 0
                t2 = jnp.zeros_like(t1)
            elif isinstance(op["G"], dict):
                from pita_tpu.ops.pallas.g_op import g_operator_contract

                gp = op["G"]
                t2 = g_operator_contract(
                    gp["sp1"], gp["sp2"], gp["att_mask"], gp["satq"],
                    gp["m_pre"], gp["w2"], Bv,
                    rows_per_block=g_rows_per_block,
                    interpret=g_kernel_interpret,
                ).astype(t1.dtype)
            else:
                t2 = jnp.einsum("bnmfg,tbmf->tbng", op["G"], Bv)
            if first:
                t3 = 2 * (gather_node(op["UD"]) - gather_edge(op["UD2"]))
            else:
                t3 = 2 * (
                    jnp.einsum("bngd,tbnd->tbng", op["UD"], dxc16)
                    - jnp.einsum("bnmgd,tbmd->tbng", op["UD2"], dxc16)
                )
            t4 = 2 * (gather_node(op["VD"]) - gather_edge(op["VD2"]))
            d_agg = t1 + t2 + t3 + t4  # (T,B,N,F)

            # --- coordinate tangent: row_dw and y = d_w @ x, operator form
            row_dw = (
                jnp.einsum("bnf,tbnf->tbn", op["RS"], A)
                + jnp.einsum("bnmf,tbmf->tbn", op["rdiv"], Bv)
                + 2 * (gather_node(op["QE1"]) - gather_edge(op["QED"]))
            )
            y = (
                jnp.einsum("bnfd,tbnf->tbnd", op["RX"], A)
                + jnp.einsum("bnmfd,tbmf->tbnd", op["RX2"], Bv)
                + 2 * (gather_node(op["QEX1"]) - gather_edge(op["QEXD"]))
            )
            if first:
                row_dw = row_dw + 2 * (
                    gather_node(op["QC1"]) - gather_edge(op["QCD"])
                )
                y = y + 2 * (gather_node(op["QCX1"]) - gather_edge(op["QCXD"]))
            else:
                row_dw = row_dw + 2 * (
                    jnp.einsum("bnd,tbnd->tbn", op["QC1"], dxc16)
                    - jnp.einsum("bnmd,tbmd->tbn", op["QCD"], dxc16)
                )
                y = y + 2 * (
                    jnp.einsum("bndq,tbnd->tbnq", op["QCX1"], dxc16)
                    - jnp.einsum("bnmdq,tbmd->tbnq", op["QCXD"], dxc16)
                )
            row_w = jnp.sum(acts.w, axis=2)  # (B,N) f32
            dxc = (
                dxc
                + dxc * row_w[None, ..., None]
                + acts.x_in[None] * row_dw[..., None].astype(jnp.float32)
                - y.astype(jnp.float32)
                - jnp.einsum("bnm,tbmd->tbnd", acts.w, dxc)
            )

            # --- node update tangent
            d_node_in = jnp.concatenate([dh, d_agg], axis=-1)
            d_nz = d_node_in @ lp.w_n1.astype(cd)
            d_out = (acts.sp_n[None] * d_nz) @ lp.w_n2.astype(cd)
            dh = dh + d_out if getattr(module, "recurrent", True) else d_out

        d_vel = dxc - dxs
        d_vel = d_vel - jnp.mean(d_vel, axis=2, keepdims=True)
        d_flat = d_vel.reshape(Tc, B, dim).astype(jnp.float32)
        # diagonal entries: component tangent_idx[t] of tangent t's output
        diag = jnp.take_along_axis(
            d_flat, tangent_idx[:, None, None], axis=2
        )[..., 0]
        return diag  # (Tc, B)

    if chunk >= T_all:
        diag = run_chunk(jnp.arange(T_all))
        trace = jnp.sum(diag, axis=0)
    else:
        n_chunks = -(-T_all // chunk)
        pad = n_chunks * chunk - T_all
        idx = jnp.pad(jnp.arange(T_all), (0, pad)).reshape(n_chunks, chunk)
        valid = (jnp.arange(n_chunks * chunk) < T_all).reshape(n_chunks, chunk)
        diags = jax.lax.map(run_chunk, idx)  # (n_chunks, chunk, B)
        trace = jnp.sum(diags * valid[..., None], axis=(0, 1))
    return out, trace


def supports_fast_divergence(backbone) -> bool:
    from pita_tpu.nets.egnn import EGNNBackbone

    return isinstance(backbone, EGNNBackbone)


def score_divergence_fast(score_wrapper, params, ht, x, beta,
                          tangent_chunk: int = None, chain_chunk: int = None,
                          pallas: bool = False, pallas_block_b: int = 2,
                          pallas_tangent_chunk: int = 16,
                          pallas_interpret: bool = False,
                          g_kernel: bool = False,
                          g_rows_per_block: int = 4):
    """div_x score(x) for an EGNN-backed ScoreWrapper, exact.

    Chain rule through the EDM preconditioning (precondition.py):
      score = ((c_s−1)/h)·x + (c_out/h)·F(c_noise, c_in·x, β)
      div   = dim·(c_s−1)/h + (c_out·c_in/h)·tr J_F      (×β if β-precond).

    ``chain_chunk`` bounds HBM: the per-edge operators G are (B, N², F²) —
    large batches are processed in serial chain blocks (primal recomputed per
    block; it is O(1/D) of the tangent work).
    """
    from pita_tpu.nets.precondition import _coeffs

    B, dim = x.shape
    ht = jnp.broadcast_to(jnp.asarray(ht, x.dtype).reshape(-1), (B,))
    c_s, c_in, c_out, c_noise = _coeffs(ht)
    module = score_wrapper.backbone

    if pallas:
        # fused kernel: every tangent intermediate stays in VMEM, so no
        # chain chunking is needed (HBM holds only x and the weights)
        def trace_of(cn, xin):
            from pita_tpu.ops.pallas.egnn_fwd import egnn_jacobian_trace_pallas

            return egnn_jacobian_trace_pallas(
                params, module, cn, xin, beta,
                block_b=pallas_block_b, tangent_chunk=pallas_tangent_chunk,
                interpret=pallas_interpret,
            )

        chain_chunk = None
    else:
        def trace_of(cn, xin):
            return egnn_jacobian_trace(
                params, module, cn, xin, beta, tangent_chunk=tangent_chunk,
                g_kernel=g_kernel, g_kernel_interpret=pallas_interpret,
                g_rows_per_block=g_rows_per_block,
            )[1]

    x_in = c_in[:, None] * x
    if chain_chunk is None or B <= chain_chunk:
        trJ = trace_of(c_noise, x_in)
    else:
        pad = (-B) % chain_chunk
        cn_p = jnp.pad(c_noise, (0, pad))
        x_p = jnp.pad(x_in, ((0, pad), (0, 0)))
        nb = (B + pad) // chain_chunk
        trJ = jax.lax.map(
            lambda args: trace_of(*args),
            (cn_p.reshape(nb, chain_chunk), x_p.reshape(nb, chain_chunk, dim)),
        ).reshape(-1)[:B]

    div = dim * (c_s - 1.0) / ht + (c_out * c_in / ht) * trJ
    if score_wrapper.precondition_beta:
        bb = jnp.broadcast_to(jnp.asarray(beta, x.dtype).reshape(-1), (B,))
        div = div * bb
    return div
