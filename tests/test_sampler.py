"""Integrator correctness against analytic Gaussian score/energy.

For a VE diffusion of N(0, σ0² I) the noised marginal is N(0, (σ0²+h) I),
so the exact score is -x/(σ0²+h) and exact energy U_t = ||x||²/(2(σ0²+h)).
With γ=1 the FK weight drift is then exactly x-independent:

    ⟨-∇U, b⟩ + div(b) + ∂U/∂t = g²|x|²/2v² - d·g²/2v - g²|x|²/2v² = -d·g²/2v,

so log-weights have zero variance — a sharp end-to-end test of the drift
assembly (sdes.py:130-239 parity), the scan integrator, and the diagnostics.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pita_tpu.sampler import IntegratorConfig, integrate_sde, mala, negative_time_descent
from pita_tpu.schedules import ElucidatingNoiseSchedule, ConstantAnnealingSchedule
from pita_tpu.targets.base import Target


SIGMA0_SQ = 1.0
DIM = 2


class GaussianTarget(Target):
    is_molecule = False
    dim = DIM

    def __init__(self, sigma0_sq=SIGMA0_SQ):
        self.s = sigma0_sq

    def log_prob(self, x):
        return -jnp.sum(x**2, axis=-1) / (2 * self.s)


class AnalyticScore:
    """Exact score of the noised Gaussian, duck-typing ScoreWrapper."""

    def __init__(self, sigma0_sq=SIGMA0_SQ):
        self.s = sigma0_sq

    def score(self, params, ht, xt, beta):
        ht = jnp.broadcast_to(jnp.asarray(ht, xt.dtype).reshape(-1), (xt.shape[0],))
        return -xt / (self.s + ht[:, None])

    def denoiser(self, params, ht, xt, beta):
        ht = jnp.broadcast_to(jnp.asarray(ht, xt.dtype).reshape(-1), (xt.shape[0],))
        return xt + ht[:, None] * self.score(params, ht, xt, beta)


class AnalyticEnergy:
    """Exact noised energy, duck-typing EnergyWrapper."""

    def __init__(self, sigma0_sq=SIGMA0_SQ):
        self.s = sigma0_sq

    def energy(self, params, ht, xt, beta, **kw):
        ht = jnp.broadcast_to(jnp.asarray(ht, xt.dtype).reshape(-1), (xt.shape[0],))
        return jnp.sum(xt**2, axis=-1) / (2 * (self.s + ht))


SCHED = ElucidatingNoiseSchedule(sigma_min=0.01, sigma_max=10.0, rho=7.0)


def _run(rng, gamma, cfg, n_chains=4096):
    anneal = ConstantAnnealingSchedule(annealing_factor=gamma)
    scale = float(np.sqrt(SCHED.h(jnp.asarray(1.0)) / gamma))
    k_prior, k_int = jax.random.split(rng)
    x1 = jax.random.normal(k_prior, (n_chains, DIM)) * scale
    return integrate_sde(
        k_int,
        x1,
        AnalyticScore(),
        AnalyticEnergy(),
        params_score={},
        params_energy={},
        noise_schedule=SCHED,
        annealing_schedule=anneal,
        target=GaussianTarget(),
        beta=1.0,
        cfg=cfg,
    )


def test_exact_score_zero_variance_weights(rng):
    cfg = IntegratorConfig(num_integration_steps=150, end_resampling_step=150)
    res = _run(rng, 1.0, cfg, n_chains=1024)
    # no resampling pass: interval > steps
    res = _run(rng, 1.0, cfg.replace(resampling_interval=-1), n_chains=1024)
    final_lw = np.asarray(res.logweights[-1])
    # drift_A is x-independent for the exact score => ~zero weight variance.
    # (resampling_interval=-1 skips weight computation; rerun with weights on)
    cfg_w = cfg.replace(resampling_interval=151)
    res = _run(rng, 1.0, cfg_w, n_chains=1024)
    final_lw = np.asarray(res.logweights[-1])
    assert final_lw.std() < 0.05, f"weight std {final_lw.std()}"


def test_exact_score_recovers_target_variance(rng):
    cfg = IntegratorConfig(
        num_integration_steps=200, end_resampling_step=200, resampling_interval=-1
    )
    res = _run(rng, 1.0, cfg)
    var = np.asarray(res.samples).var(axis=0)
    np.testing.assert_allclose(var, SIGMA0_SQ, rtol=0.1)
    assert res.samples.shape == (4096, DIM)


def test_annealed_run_with_resampling_hits_tempered_variance(rng):
    """γ=2 anneals to p² = N(0, σ0²/2); FK weights + resampling correct the drift bias."""
    gamma = 2.0
    cfg = IntegratorConfig(
        num_integration_steps=200,
        end_resampling_step=180,
        resampling_interval=1,
        resample_at_end=True,
    )
    res = _run(rng, gamma, cfg)
    var = np.asarray(res.samples).var(axis=0)
    np.testing.assert_allclose(var, SIGMA0_SQ / gamma, rtol=0.2)
    # diagnostics populated
    assert res.num_unique.shape[0] == 201  # 200 steps + end resample
    assert int(res.num_unique[-1]) <= 4096


def test_resampling_interval_gating(rng):
    """Resampling only fires inside [start, end) every `interval` steps."""
    cfg = IntegratorConfig(
        num_integration_steps=50,
        start_resampling_step=10,
        end_resampling_step=40,
        resampling_interval=10,
    )
    res = _run(rng, 1.5, cfg, n_chains=256)
    nu = np.asarray(res.num_unique)
    fired = np.where(nu < 256)[0]
    # steps with (step+1) % 10 == 0 within [10, 40): 19, 29, 39
    assert set(fired).issubset({19, 29, 39}), fired


def test_mala_refinement_converges(rng):
    target = GaussianTarget()
    x = jax.random.normal(rng, (2048, DIM)) * 3.0 + 2.0
    x_out, acc = mala(
        jax.random.fold_in(rng, 1),
        x,
        target,
        num_steps=200,
        dt_init=0.5,
        adaptive=True,
        mean_free=False,
    )
    assert acc.shape == (200,)
    assert 0.2 < float(acc[-50:].mean()) < 0.95
    m = np.asarray(x_out).mean(axis=0)
    v = np.asarray(x_out).var(axis=0)
    np.testing.assert_allclose(m, 0.0, atol=0.15)
    np.testing.assert_allclose(v, SIGMA0_SQ, rtol=0.15)


def test_negative_time_descent_decreases_energy(rng):
    target = GaussianTarget()
    x = jax.random.normal(rng, (128, DIM)) * 5.0
    e0 = -np.asarray(target.log_prob(x)).mean()
    x_out = negative_time_descent(
        x, target, num_steps=50, dt=0.05, do_langevin=False,
        key=jax.random.fold_in(rng, 1), mean_free=False,
    )
    e1 = -np.asarray(target.log_prob(x_out)).mean()
    assert e1 < e0


def test_integrator_is_jittable_end_to_end(rng):
    """The whole integrate_sde must compile as one program (static cfg)."""
    import functools

    cfg = IntegratorConfig(num_integration_steps=20, end_resampling_step=20)
    fn = functools.partial(
        integrate_sde,
        score_wrapper=AnalyticScore(),
        energy_wrapper=AnalyticEnergy(),
        params_score={},
        params_energy={},
        noise_schedule=SCHED,
        annealing_schedule=ConstantAnnealingSchedule(annealing_factor=1.0),
        target=GaussianTarget(),
        cfg=cfg,
    )
    jfn = jax.jit(lambda k, x, b: fn(k, x, beta=b))
    x1 = jax.random.normal(rng, (128, DIM)) * 3.0
    res = jfn(jax.random.fold_in(rng, 1), x1, jnp.asarray(1.0))
    assert res.samples.shape == (128, DIM)
    assert np.isfinite(np.asarray(res.samples)).all()


def test_divergence_quadrature_matches_per_step(rng):
    """divergence_update_interval=K reuses the exact divergence between
    quadrature nodes; for the analytic Gaussian (div depends only on t) the
    K=5 run must match K=1 closely."""
    cfg1 = IntegratorConfig(
        num_integration_steps=200, end_resampling_step=180,
        resampling_interval=1, resample_at_end=True,
    )
    res1 = _run(rng, 2.0, cfg1, n_chains=2048)
    res5 = _run(rng, 2.0, cfg1.replace(divergence_update_interval=5), n_chains=2048)
    v1 = float(np.asarray(res1.samples).var())
    v5 = float(np.asarray(res5.samples).var())
    np.testing.assert_allclose(v5, v1, rtol=0.05)
    np.testing.assert_allclose(v5, SIGMA0_SQ / 2.0, rtol=0.2)


def test_segmented_integration_matches_single_dispatch(rng):
    """segment_size splits the scan into bounded dispatches; results must be
    bit-comparable to the single-dispatch run (same keys, same flags)."""
    cfg = IntegratorConfig(
        num_integration_steps=90, end_resampling_step=80,
        resampling_interval=4, resample_at_end=True,
    )
    res_full = _run(rng, 2.0, cfg, n_chains=512)
    res_seg = _run(rng, 2.0, cfg.replace(segment_size=40), n_chains=512)  # ragged tail
    np.testing.assert_allclose(
        np.asarray(res_full.samples), np.asarray(res_seg.samples), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(res_full.logweights), np.asarray(res_seg.logweights), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(res_full.num_unique), np.asarray(res_seg.num_unique)
    )


def test_compile_only_prewarms_without_running(rng):
    """compile_only AOT-compiles the segment program and returns None; a
    subsequent real run must reuse the cached executable (same cfg/B/D) and
    produce results identical to a never-prewarmed run (prewarm must not
    perturb the segment cache semantics). Non-segmented configs reject
    compile_only loudly."""
    import pytest

    from pita_tpu.sampler.integrator import _SEGMENT_CACHE

    cfg = IntegratorConfig(
        num_integration_steps=30, end_resampling_step=25,
        resampling_interval=4, segment_size=10,
    )
    _SEGMENT_CACHE.clear()
    anneal = ConstantAnnealingSchedule(annealing_factor=2.0)
    score, energy, target = AnalyticScore(), AnalyticEnergy(), GaussianTarget()
    x1 = jax.random.normal(rng, (64, DIM))
    out = integrate_sde(
        rng, x1, score, energy, {}, {}, SCHED, anneal, target, 1.0, cfg,
        compile_only=True,
    )
    assert out is None
    assert len(_SEGMENT_CACHE) == 1  # the jitted segment fn is cached
    res = integrate_sde(
        rng, x1, score, energy, {}, {}, SCHED, anneal, target, 1.0, cfg
    )
    assert len(_SEGMENT_CACHE) == 1  # the real run reused the prewarmed entry
    _SEGMENT_CACHE.clear()
    res_fresh = integrate_sde(
        rng, x1, score, energy, {}, {}, SCHED, anneal, target, 1.0, cfg
    )
    np.testing.assert_array_equal(
        np.asarray(res.samples), np.asarray(res_fresh.samples)
    )
    with pytest.raises(ValueError, match="segmented"):
        integrate_sde(
            rng, x1, score, energy, {}, {}, SCHED, anneal, target, 1.0,
            cfg.replace(segment_size=None), compile_only=True,
        )
