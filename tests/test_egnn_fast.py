"""egnn_fast: factorized forward and edge-operator exact divergence.

Validates the fast path against the generic references: forward against the
flax module apply, Jacobian trace against ops.divergence.exact_divergence
(jacfwd), and the full score divergence against the wrapper chain.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pita_tpu.nets import EGNNBackbone, ScoreWrapper
from pita_tpu.nets.egnn_fast import (
    egnn_apply,
    egnn_jacobian_trace,
    score_divergence_fast,
    supports_fast_divergence,
)
from pita_tpu.ops.divergence import exact_divergence
from pita_tpu.schedules import ElucidatingNoiseSchedule


def _setup(n_particles=5, hidden=16, n_layers=2, attention=True, tanh=True,
           condition=True, seed=0):
    mod = EGNNBackbone(
        n_particles=n_particles, n_spatial_dim=3, hidden_nf=hidden,
        n_layers=n_layers, attention=attention, tanh=tanh,
        condition_on_temperature=condition,
    )
    key = jax.random.PRNGKey(seed)
    dim = n_particles * 3
    B = 4
    t = jax.random.uniform(key, (B,))
    x = jax.random.normal(jax.random.fold_in(key, 1), (B, dim))
    beta = jnp.asarray(1.3)
    params = mod.init(jax.random.fold_in(key, 2), t, x, beta)
    return mod, params, t, x, beta


@pytest.mark.parametrize("attention,tanh", [(True, True), (False, True), (True, False)])
def test_forward_matches_flax(attention, tanh):
    mod, params, t, x, beta = _setup(attention=attention, tanh=tanh)
    ref = mod.apply(params, t, x, beta)
    fast = egnn_apply(params, mod, t, x, beta)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("attention,tanh", [(True, True), (False, True), (True, False)])
def test_jacobian_trace_matches_jacfwd(attention, tanh):
    mod, params, t, x, beta = _setup(attention=attention, tanh=tanh)
    f = lambda tt, xx: mod.apply(params, tt, xx, beta)
    ref = exact_divergence(f, t, x)
    _, trace = egnn_jacobian_trace(params, mod, t, x, beta)
    np.testing.assert_allclose(np.asarray(trace), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_jacobian_trace_chunked():
    mod, params, t, x, beta = _setup()
    _, full = egnn_jacobian_trace(params, mod, t, x, beta)
    _, chunked = egnn_jacobian_trace(params, mod, t, x, beta, tangent_chunk=4)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), rtol=1e-5, atol=1e-5)


def test_score_divergence_fast_matches_generic():
    mod, params, t, x, beta = _setup()
    assert supports_fast_divergence(mod)
    score = ScoreWrapper(mod)
    sched = ElucidatingNoiseSchedule(sigma_min=0.05, sigma_max=10.0, rho=7.0)
    score_fn = lambda tt, xx: score.score(params, sched.h(tt), xx, beta)
    ref = exact_divergence(score_fn, t, x)
    fast = score_divergence_fast(score, params, sched.h(t), x, beta)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_score_divergence_fast_beta_precondition():
    mod, params, t, x, beta = _setup()
    score = ScoreWrapper(mod, precondition_beta=True)
    sched = ElucidatingNoiseSchedule(sigma_min=0.05, sigma_max=10.0, rho=7.0)
    score_fn = lambda tt, xx: score.score(params, sched.h(tt), xx, beta)
    ref = exact_divergence(score_fn, t, x)
    fast = score_divergence_fast(score, params, sched.h(t), x, beta)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_jacobian_trace_with_atom_types():
    mod = EGNNBackbone(
        n_particles=4, n_spatial_dim=3, hidden_nf=8, n_layers=2,
        atom_types=(0, 1, 1, 2),
    )
    key = jax.random.PRNGKey(3)
    t = jax.random.uniform(key, (3,))
    x = jax.random.normal(jax.random.fold_in(key, 1), (3, 12))
    beta = jnp.asarray(1.0)
    params = mod.init(jax.random.fold_in(key, 2), t, x, beta)
    f = lambda tt, xx: mod.apply(params, tt, xx, beta)
    ref = exact_divergence(f, t, x)
    out_fast = egnn_apply(params, mod, t, x, beta)
    np.testing.assert_allclose(
        np.asarray(out_fast), np.asarray(mod.apply(params, t, x, beta)),
        rtol=2e-4, atol=2e-5,
    )
    _, trace = egnn_jacobian_trace(params, mod, t, x, beta)
    np.testing.assert_allclose(np.asarray(trace), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_terms_dispatch_exact_equals_generic():
    """compute_sde_terms divergence: the EGNN fast path must equal the
    generic jacfwd path bit-for-tolerance."""
    from pita_tpu.sampler.terms import compute_sde_terms
    from pita_tpu.schedules import ConstantAnnealingSchedule

    mod, params, t, x, beta = _setup()
    score = ScoreWrapper(mod)
    from pita_tpu.nets import EnergyWrapper

    energy = EnergyWrapper(
        EGNNBackbone(n_particles=5, n_spatial_dim=3, hidden_nf=16, n_layers=2)
    )
    pe = energy.init(jax.random.PRNGKey(9), x.shape[1])
    sched = ElucidatingNoiseSchedule(sigma_min=0.05, sigma_max=10.0, rho=7.0)
    anneal = ConstantAnnealingSchedule(annealing_factor=1.5)
    kw = dict(clip_quantile=1.0)
    t_fast = compute_sde_terms(
        score, energy, params, pe, sched, anneal, t, x, beta,
        divergence_mode="exact", **kw,
    )
    t_gen = compute_sde_terms(
        score, energy, params, pe, sched, anneal, t, x, beta,
        divergence_mode="exact_generic", **kw,
    )
    np.testing.assert_allclose(
        np.asarray(t_fast.divergence), np.asarray(t_gen.divergence),
        rtol=2e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(t_fast.drift_A), np.asarray(t_gen.drift_A), rtol=2e-3, atol=2e-3
    )


def test_hutchpp_exact_at_full_rank():
    """Hutch++ with rank ≥ D captures the whole Jacobian: exact trace."""
    from pita_tpu.ops.divergence import hutchpp_divergence, exact_divergence

    key = jax.random.PRNGKey(0)
    D = 10
    M = jax.random.normal(key, (D, D)) * 0.3

    f = lambda t, x: jnp.tanh(x) @ M
    x = jax.random.normal(jax.random.fold_in(key, 1), (6, D))
    t = jnp.zeros((6,))
    ref = exact_divergence(f, t, x)
    est = hutchpp_divergence(f, t, x, jax.random.fold_in(key, 2), rank=D, num_probes=1)
    np.testing.assert_allclose(np.asarray(est), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_hutchpp_beats_hutchinson_variance():
    from pita_tpu.ops.divergence import (
        hutchpp_divergence,
        hutchinson_divergence,
        exact_divergence,
    )

    key = jax.random.PRNGKey(0)
    D = 30
    M = jax.random.normal(key, (D, D)) * 0.5
    f = lambda t, x: jnp.tanh(x @ M) @ M.T
    x = jax.random.normal(jax.random.fold_in(key, 1), (4, D))
    t = jnp.zeros((4,))
    ref = np.asarray(exact_divergence(f, t, x))
    # equal pass budget: hutch++ rank 8 + 4 probes = 20 passes vs hutchinson 20
    err_pp, err_h = [], []
    for s in range(8):
        k = jax.random.fold_in(key, 10 + s)
        pp = np.asarray(hutchpp_divergence(f, t, x, k, rank=8, num_probes=4))
        h = np.asarray(hutchinson_divergence(f, t, x, k, num_probes=20))
        err_pp.append(np.mean((pp - ref) ** 2))
        err_h.append(np.mean((h - ref) ** 2))
    assert np.mean(err_pp) < np.mean(err_h)


def test_score_divergence_chain_chunked():
    mod, params, t, x, beta = _setup()
    score = ScoreWrapper(mod)
    sched = ElucidatingNoiseSchedule(sigma_min=0.05, sigma_max=10.0, rho=7.0)
    full = score_divergence_fast(score, params, sched.h(t), x, beta)
    chunked = score_divergence_fast(
        score, params, sched.h(t), x, beta, chain_chunk=3
    )
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), rtol=1e-5, atol=1e-5)
