"""G-operator Pallas kernel parity vs the materialized-G einsum (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pita_tpu.ops.pallas.g_op import g_operator_contract


@pytest.mark.parametrize("N,F,T,B", [(13, 16, 39, 3), (7, 32, 21, 2)])
def test_g_operator_contract_matches_einsum(rng, N, F, T, B):
    ks = jax.random.split(rng, 8)
    sp1 = jax.random.uniform(ks[0], (B, N, N, F))
    sp2 = jax.random.uniform(ks[1], (B, N, N, F))
    att = jax.random.uniform(ks[2], (B, N, N))
    satq = jax.random.normal(ks[3], (B, N, N, F)) * 0.1
    m_pre = jax.random.normal(ks[4], (B, N, N, F))
    w2 = jax.random.normal(ks[5], (F, F)) / np.sqrt(F)
    bv = jax.random.normal(ks[6], (T, B, N, F)) * 0.5
    mask = 1.0 - jnp.eye(N)
    att_mask = att * mask
    satq_m = satq * mask[None, :, :, None]

    # reference: materialized G, the egnn_fast einsum
    K = sp1[..., :, None] * w2[None, None, None] * sp2[..., None, :]
    G = att_mask[..., None, None] * K + satq_m[..., :, None] * m_pre[..., None, :]
    t2_ref = jnp.einsum(
        "bnmfg,tbmf->tbng", G.astype(jnp.float32), bv.astype(jnp.float32)
    )

    t2 = g_operator_contract(
        sp1, sp2, att_mask, satq_m, m_pre, w2, bv,
        rows_per_block=4, interpret=True,
    )
    assert t2.shape == (T, B, N, F)
    # bf16 matmul inputs in the kernel vs f32 einsum: allow bf16-level error
    np.testing.assert_allclose(
        np.asarray(t2), np.asarray(t2_ref), rtol=2e-2, atol=2e-2
    )


def test_g_operator_contract_f32_reference_tight(rng):
    """Same contraction with near-integer inputs: exact agreement (checks
    indexing/padding, independent of bf16 rounding)."""
    B, N, F, T = 2, 5, 8, 15
    ks = jax.random.split(rng, 8)
    rnd = lambda k, sh: jnp.round(jax.random.normal(k, sh) * 2)
    sp1, sp2 = rnd(ks[0], (B, N, N, F)), rnd(ks[1], (B, N, N, F))
    att = rnd(ks[2], (B, N, N))
    satq, m_pre = rnd(ks[3], (B, N, N, F)), rnd(ks[4], (B, N, N, F))
    w2 = rnd(ks[5], (F, F))
    bv = rnd(ks[6], (T, B, N, F))
    mask = 1.0 - jnp.eye(N)
    att_mask = att * mask
    satq_m = satq * mask[None, :, :, None]
    K = sp1[..., :, None] * w2[None, None, None] * sp2[..., None, :]
    G = att_mask[..., None, None] * K + satq_m[..., :, None] * m_pre[..., None, :]
    t2_ref = jnp.einsum("bnmfg,tbmf->tbng", G, bv)
    t2 = g_operator_contract(
        sp1, sp2, att_mask, satq_m, m_pre, w2, bv,
        rows_per_block=2, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t2_ref), atol=1e-3)


@pytest.mark.parametrize("attention", [True, False])
def test_jacobian_trace_g_kernel_matches_materialized(rng, attention):
    """End-to-end: egnn_jacobian_trace with the G-operator kernel (interpret)
    vs the materialized-G einsum path on a real EGNN."""
    from tests.test_egnn_fast import _setup
    from pita_tpu.nets.egnn_fast import egnn_jacobian_trace

    mod, params, t, x, beta = _setup(
        n_particles=5, hidden=16, n_layers=3, attention=attention
    )
    out_ref, tr_ref = egnn_jacobian_trace(params, mod, t, x, beta)
    out_gk, tr_gk = egnn_jacobian_trace(
        params, mod, t, x, beta,
        g_kernel=True, g_kernel_interpret=True, g_rows_per_block=2,
    )
    np.testing.assert_allclose(np.asarray(out_gk), np.asarray(out_ref), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(tr_gk), np.asarray(tr_ref), rtol=2e-2, atol=5e-3
    )
