"""Loss suite: gating, gradient routing, DEM estimator."""

import jax
import jax.numpy as jnp
import numpy as np

from pita_tpu.nets import MLPBackbone, ScoreWrapper, EnergyWrapper
from pita_tpu.schedules import ElucidatingNoiseSchedule
from pita_tpu.targets import GMM40
from pita_tpu.train.losses import LossConfig, compute_losses
from pita_tpu.train.dem_estimator import estimate_Rt, estimate_grad_Rt, clip_scores

SCHED = ElucidatingNoiseSchedule(sigma_min=0.01, sigma_max=10.0, rho=7.0)
DIM = 2


def _setup(rng):
    sw = ScoreWrapper(MLPBackbone(out_dim=DIM, hidden_size=32, hidden_layers=2, emb_size=16))
    ew = EnergyWrapper(MLPBackbone(out_dim=DIM, hidden_size=32, hidden_layers=2, emb_size=16))
    ps = sw.init(rng, DIM)
    pe = ew.init(jax.random.fold_in(rng, 1), DIM)
    return sw, ew, ps, pe


def _batch(rng, gmm, B=32):
    x0 = gmm.sample(rng, B)
    e0, f0 = gmm.log_prob_and_force(x0)
    return x0, e0, f0


def test_losses_finite_and_structured(rng):
    gmm = GMM40()
    sw, ew, ps, pe = _setup(rng)
    x0, e0, f0 = _batch(jax.random.fold_in(rng, 2), gmm)
    cfg = LossConfig()
    total, aux = compute_losses(
        sw, ew, ps, pe, SCHED, cfg, jax.random.fold_in(rng, 3),
        x0, e0, f0, 1.0, target=gmm,
    )
    assert np.isfinite(float(total))
    for k in [
        "score_loss", "energy_score_loss", "target_score_loss",
        "energy_matching_loss", "dem_energy_loss", "dU_dt_regularization_loss",
    ]:
        assert np.isfinite(float(aux[k])), k
    # default weights: dem & reg are disabled
    assert float(aux["dem_energy_loss"]) == 0.0
    assert float(aux["dU_dt_regularization_loss"]) == 0.0


def test_gradient_routing(rng):
    """Energy-score loss must not backprop into the score net (stop-grad,
    energytemp_module.py:450); score losses must not touch the energy net."""
    gmm = GMM40()
    sw, ew, ps, pe = _setup(rng)
    x0, e0, f0 = _batch(jax.random.fold_in(rng, 2), gmm)
    k = jax.random.fold_in(rng, 3)

    # only energy_score on: grads wrt score params must vanish
    cfg = LossConfig(w_score=0, w_energy_matching=0, w_target_score=0, w_energy_score=1)
    g = jax.grad(
        lambda both: compute_losses(
            sw, ew, both[0], both[1], SCHED, cfg, k, x0, e0, f0, 1.0, target=gmm
        )[0]
    )((ps, pe))
    score_gnorm = optax_global_norm(g[0])
    energy_gnorm = optax_global_norm(g[1])
    assert score_gnorm < 1e-12, f"score net received grads: {score_gnorm}"
    assert energy_gnorm > 1e-12

    # only score losses on: grads wrt energy params must vanish
    cfg = LossConfig(w_score=1, w_energy_matching=0, w_target_score=0.01, w_energy_score=0)
    g = jax.grad(
        lambda both: compute_losses(
            sw, ew, both[0], both[1], SCHED, cfg, k, x0, e0, f0, 1.0, target=gmm
        )[0]
    )((ps, pe))
    assert optax_global_norm(g[1]) < 1e-12
    assert optax_global_norm(g[0]) > 1e-12


def optax_global_norm(tree):
    import optax

    return float(optax.global_norm(tree))


def test_dem_estimator_gaussian_closed_form(rng):
    """For p = N(0, s I): E_t[x] smoothes to N(0, (s+h) I), so
    grad R_t ≈ -x/(s+h) (score of the noised density)."""
    s = 1.0

    def log_prob(x):
        return -jnp.sum(x**2, axis=-1) / (2 * s)  # unnormalized

    x = jnp.asarray([[1.0, -0.5], [0.3, 2.0]])
    ht = jnp.full((2,), 0.5)
    grad_rt = estimate_grad_Rt(rng, ht, x, log_prob, num_mc_samples=20000)
    np.testing.assert_allclose(grad_rt, -x / (s + 0.5), atol=0.05)


def test_clip_scores():
    s = jnp.asarray([[3.0, 4.0], [0.3, 0.4]])
    out = clip_scores(s, max_norm=1.0)
    np.testing.assert_allclose(jnp.linalg.norm(out[0]), 1.0, rtol=1e-4)
    np.testing.assert_allclose(out[1], s[1], rtol=1e-5)
    # molecule mode: per-particle norms
    sm = jnp.ones((2, 6))  # 2 particles × 3 dims
    out = clip_scores(sm, max_norm=1.0, n_particles=2, n_spatial_dim=3)
    np.testing.assert_allclose(
        jnp.linalg.norm(out.reshape(2, 2, 3), axis=-1), 1.0, rtol=1e-4
    )


def test_only_train_score_mode(rng):
    """configs/debug/score_only.yaml capability: everything but score zeroed."""
    gmm = GMM40()
    sw, ew, ps, pe = _setup(rng)
    x0, e0, f0 = _batch(jax.random.fold_in(rng, 2), gmm)
    cfg = LossConfig(only_train_score=True)
    total, aux = compute_losses(
        sw, ew, ps, pe, SCHED, cfg, jax.random.fold_in(rng, 3), x0, e0, f0, 1.0
    )
    assert float(aux["energy_score_loss"]) == 0.0
    assert float(aux["energy_matching_loss"]) == 0.0
    assert float(total) == float(aux["score_loss"] * cfg.w_score)


def test_estimate_Rt_matches_noised_gmm_oracle(rng):
    """E_ε[p(x+√h ε)] is exactly the Gaussian-convolved density, which for a
    GMM is the analytic noised GMM — R_t must converge to its log."""
    from pita_tpu.targets.gmm import noised_gmm_log_prob

    gmm = GMM40()
    x = gmm.sample(rng, 8)
    ht = jnp.full((8,), 0.5)
    est = np.mean(
        [
            np.asarray(
                estimate_Rt(jax.random.fold_in(rng, i), ht, x, gmm.log_prob, 4000)
            )
            for i in range(8)
        ],
        axis=0,
    )
    ref = np.asarray(noised_gmm_log_prob(gmm, ht, x))
    np.testing.assert_allclose(est, ref, atol=0.1)


def test_richardson_wrapper(rng):
    from pita_tpu.train.dem_estimator import wrap_for_richardsons, estimate_Rt as _rt

    gmm = GMM40()
    x = gmm.sample(rng, 4)
    ht = jnp.full((4,), 0.3)
    rich = wrap_for_richardsons(_rt)
    out = rich(rng, ht, x, gmm.log_prob, 256)
    assert out.shape == (4,)
    assert np.isfinite(np.asarray(out)).all()
