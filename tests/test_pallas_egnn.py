"""Fused Pallas EGNN forward vs the XLA reference path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from pita_tpu.nets import EGNNBackbone
from pita_tpu.nets.egnn_fast import egnn_apply
from pita_tpu.ops.pallas.egnn_fwd import egnn_forward_pallas


def test_pallas_forward_matches_xla(rng):
    mod = EGNNBackbone(n_particles=7, n_spatial_dim=3, hidden_nf=16, n_layers=2)
    t = jax.random.uniform(rng, (10,))
    x = jax.random.normal(jax.random.fold_in(rng, 1), (10, 21))
    beta = jnp.asarray(1.2)
    params = mod.init(jax.random.fold_in(rng, 2), t, x, beta)
    ref = egnn_apply(params, mod, t, x, beta)
    k = egnn_forward_pallas(params, mod, t, x, beta, block_b=4, interpret=True)
    np.testing.assert_allclose(np.asarray(k), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_pallas_forward_no_attention_no_tanh(rng):
    mod = EGNNBackbone(n_particles=5, n_spatial_dim=3, hidden_nf=8, n_layers=3,
                       attention=False, tanh=False)
    t = jax.random.uniform(rng, (3,))
    x = jax.random.normal(jax.random.fold_in(rng, 1), (3, 15)) * 0.5
    params = mod.init(jax.random.fold_in(rng, 2), t, x, jnp.asarray(1.0))
    ref = egnn_apply(params, mod, t, x, jnp.asarray(1.0))
    k = egnn_forward_pallas(params, mod, t, x, jnp.asarray(1.0), block_b=2,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(k), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_integrator_pallas_score_matches_default(rng):
    """The pallas_score_forward flag must not change sampler results beyond
    float reassociation (interpret mode on CPU)."""
    from pita_tpu.nets import EnergyWrapper, ScoreWrapper
    from pita_tpu.sampler import IntegratorConfig, integrate_sde
    from pita_tpu.schedules import (
        ConstantAnnealingSchedule,
        ElucidatingNoiseSchedule,
    )
    from pita_tpu.targets import LJ13

    target = LJ13(temperature=2.0)
    mod = lambda: EGNNBackbone(n_particles=13, n_spatial_dim=3, hidden_nf=8,
                               n_layers=2)
    score, energy = ScoreWrapper(mod()), EnergyWrapper(mod())
    ps = score.init(rng, target.dim)
    pe = energy.init(jax.random.fold_in(rng, 1), target.dim)
    sched = ElucidatingNoiseSchedule(sigma_min=0.05, sigma_max=10.0, rho=7.0)
    anneal = ConstantAnnealingSchedule(annealing_factor=1.2)
    x1 = jax.random.normal(jax.random.fold_in(rng, 2), (6, target.dim)) * 3.0
    base = IntegratorConfig(num_integration_steps=4, end_resampling_step=4,
                            resampling_interval=2)
    r0 = integrate_sde(jax.random.fold_in(rng, 3), x1, score, energy, ps, pe,
                       sched, anneal, target, 1.0, base)
    r1 = integrate_sde(jax.random.fold_in(rng, 3), x1, score, energy, ps, pe,
                       sched, anneal, target, 1.0,
                       base.replace(pallas_score_forward=True,
                                    pallas_block_b=2, pallas_interpret=True))
    np.testing.assert_allclose(np.asarray(r1.samples), np.asarray(r0.samples),
                               rtol=1e-4, atol=1e-4)


def test_pallas_ad_grads_match_xla(rng):
    """egnn_forward_pallas_ad: cotangents wrt x and t must match jax.grad
    through the XLA forward (fused backward kernel, interpret mode)."""
    from pita_tpu.ops.pallas.egnn_fwd import egnn_forward_pallas_ad

    mod = EGNNBackbone(n_particles=7, n_spatial_dim=3, hidden_nf=16, n_layers=2)
    t = jax.random.uniform(rng, (6,)) + 0.1
    x = jax.random.normal(jax.random.fold_in(rng, 1), (6, 21))
    beta = jnp.asarray(1.2)
    params = mod.init(jax.random.fold_in(rng, 2), t, x, beta)
    v = jax.random.normal(jax.random.fold_in(rng, 3), (6, 21))

    def scalar_ref(t, x):
        return jnp.sum(egnn_apply(params, mod, t, x, beta) * v)

    def scalar_pal(t, x):
        return jnp.sum(
            egnn_forward_pallas_ad(params, mod, t, x, beta, block_b=2,
                                   interpret=True) * v
        )

    gt_ref, gx_ref = jax.grad(scalar_ref, argnums=(0, 1))(t, x)
    gt_pal, gx_pal = jax.grad(scalar_pal, argnums=(0, 1))(t, x)
    np.testing.assert_allclose(np.asarray(gx_pal), np.asarray(gx_ref),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gt_pal), np.asarray(gt_ref),
                               rtol=5e-4, atol=5e-5)


def test_integrator_pallas_energy_grad_matches_default(rng, monkeypatch):
    """The pallas_energy_grad flag must not change sampler results beyond
    float reassociation (interpret mode on CPU) — and the Pallas forward
    must actually be exercised (guards against silently wiring the flag
    to the default path, see ADVICE r3)."""
    import pita_tpu.ops.pallas.egnn_fwd as egnn_fwd_mod
    from pita_tpu.nets import EnergyWrapper, ScoreWrapper
    from pita_tpu.sampler import IntegratorConfig, integrate_sde
    from pita_tpu.schedules import (
        ConstantAnnealingSchedule,
        ElucidatingNoiseSchedule,
    )
    from pita_tpu.targets import LJ13

    target = LJ13(temperature=2.0)
    mod = lambda: EGNNBackbone(n_particles=13, n_spatial_dim=3, hidden_nf=8,
                               n_layers=2)
    score, energy = ScoreWrapper(mod()), EnergyWrapper(mod())
    ps = score.init(rng, target.dim)
    pe = energy.init(jax.random.fold_in(rng, 1), target.dim)
    sched = ElucidatingNoiseSchedule(sigma_min=0.05, sigma_max=10.0, rho=7.0)
    anneal = ConstantAnnealingSchedule(annealing_factor=1.2)
    x1 = jax.random.normal(jax.random.fold_in(rng, 2), (6, target.dim)) * 3.0
    base = IntegratorConfig(num_integration_steps=4, end_resampling_step=4,
                            resampling_interval=2)
    r0 = integrate_sde(jax.random.fold_in(rng, 3), x1, score, energy, ps, pe,
                       sched, anneal, target, 1.0, base)
    calls = {"n": 0}
    real_ad = egnn_fwd_mod.egnn_forward_pallas_ad

    def spy_ad(*a, **kw):
        calls["n"] += 1
        return real_ad(*a, **kw)

    monkeypatch.setattr(egnn_fwd_mod, "egnn_forward_pallas_ad", spy_ad)
    r1 = integrate_sde(jax.random.fold_in(rng, 3), x1, score, energy, ps, pe,
                       sched, anneal, target, 1.0,
                       base.replace(pallas_energy_grad=True,
                                    pallas_block_b=2, pallas_interpret=True))
    assert calls["n"] > 0, "pallas_energy_grad=True never invoked the kernel"
    np.testing.assert_allclose(np.asarray(r1.samples), np.asarray(r0.samples),
                               rtol=1e-4, atol=1e-4)


def test_pallas_jacobian_trace_matches_edge_operator(rng):
    """Fused Pallas trace kernel vs the XLA edge-operator exact trace."""
    from pita_tpu.nets.egnn_fast import egnn_jacobian_trace
    from pita_tpu.ops.pallas.egnn_fwd import egnn_jacobian_trace_pallas

    mod = EGNNBackbone(n_particles=7, n_spatial_dim=3, hidden_nf=16, n_layers=2)
    t = jax.random.uniform(rng, (5,)) + 0.1
    x = jax.random.normal(jax.random.fold_in(rng, 1), (5, 21))
    beta = jnp.asarray(1.1)
    params = mod.init(jax.random.fold_in(rng, 2), t, x, beta)
    _, tr_ref = egnn_jacobian_trace(params, mod, t, x, beta)
    tr_pal = egnn_jacobian_trace_pallas(params, mod, t, x, beta, block_b=2,
                                        tangent_chunk=8, interpret=True)
    np.testing.assert_allclose(np.asarray(tr_pal), np.asarray(tr_ref),
                               rtol=2e-3, atol=1e-3)


def test_score_divergence_fast_pallas_route(rng):
    """score_divergence_fast(pallas=True) equals the XLA route."""
    from pita_tpu.nets import ScoreWrapper
    from pita_tpu.nets.egnn_fast import score_divergence_fast

    mod = EGNNBackbone(n_particles=5, n_spatial_dim=3, hidden_nf=8, n_layers=2)
    score = ScoreWrapper(mod)
    ps = score.init(rng, 15)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (4, 15))
    ht = jnp.full((4,), 0.7)
    d0 = score_divergence_fast(score, ps, ht, x, jnp.asarray(1.0))
    d1 = score_divergence_fast(score, ps, ht, x, jnp.asarray(1.0),
                               pallas=True, pallas_block_b=2,
                               pallas_tangent_chunk=8, pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                               rtol=2e-3, atol=1e-3)
