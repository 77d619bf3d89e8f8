"""Target density correctness: closed-form energies, forces, temperatures."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pita_tpu.targets import GMM40, LJ13, DoubleWell4, MeanFreePrior, IsotropicGaussianPrior
from pita_tpu.targets.gmm import gmm_power
from pita_tpu.targets.lj import lj_pair_energy


def test_gmm_log_prob_matches_reference_torch(rng):
    """GMM-40 log-prob must match the fab/torch mixture exactly."""
    import torch

    gmm = GMM40()
    x = np.asarray(jax.random.normal(rng, (64, 2))) * 30
    ours = np.asarray(gmm.log_prob(jnp.asarray(x)))

    locs = torch.tensor(np.asarray(gmm.locs))
    scale = torch.tensor(np.asarray(gmm.scales))
    mix = torch.distributions.Categorical(logits=torch.zeros(40))
    com = torch.distributions.Independent(
        torch.distributions.Normal(locs, scale), 1
    )
    ref = torch.distributions.MixtureSameFamily(mix, com).log_prob(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_gmm_temperature_scales_log_prob(rng):
    gmm1 = GMM40(temperature=1.0)
    gmm2 = GMM40(temperature=2.0)
    x = jax.random.normal(rng, (8, 2)) * 20
    np.testing.assert_allclose(gmm1.log_prob(x) / 2.0, gmm2.log_prob(x), rtol=1e-5)


def test_gmm_power_is_exact_tempered_density(rng):
    """gmm_power(p, 2) ∝ p² — log-densities differ by a constant.

    Evaluated at samples from the base mixture (the pruned far-tail product
    modes only matter off-distribution).
    """
    from pita_tpu.targets.gmm import gmm_product

    base = GMM40()
    sq = gmm_product(base, base, prune=0.0)
    x = base.sample(rng, 256)
    diff = np.asarray(2 * base.log_prob(x) - sq.log_prob(x))
    assert diff.std() < 0.02, f"not proportional: std={diff.std()}"


def test_lj_energy_closed_form():
    """Two particles at r=rm sit at the well bottom: E_pair = -eps (×2 ordered)."""
    lj = LJ13(oscillator=False)
    # place 13 particles far apart except particles 0,1 at distance 1
    x = np.zeros((1, 13, 3))
    for i in range(13):
        x[0, i] = [10.0 * i, 0, 0]
    x[0, 1] = [1.0, 0, 0]
    e = float(lj.energy(jnp.asarray(x.reshape(1, -1)))[0])
    # pair (0,1) at r=1 contributes -1 per ordered direction => -2; others ~0
    assert abs(e - (-2.0)) < 1e-2


def test_lj_pair_energy_minimum():
    r = jnp.linspace(0.8, 1.5, 200)
    e = lj_pair_energy(r)
    assert abs(float(r[jnp.argmin(e)]) - 1.0) < 0.01
    np.testing.assert_allclose(float(lj_pair_energy(jnp.asarray(1.0))), -1.0, rtol=1e-6)


def test_lj_force_is_grad_of_logprob(rng):
    lj = LJ13(temperature=2.0)
    x = jax.random.normal(rng, (4, 39))
    lp, force = lj.log_prob_and_force(x)
    fd = jax.vmap(jax.grad(lambda xi: lj.log_prob(xi[None])[0]))(x)
    np.testing.assert_allclose(force, fd, rtol=1e-4)
    np.testing.assert_allclose(lp, lj.log_prob(x), rtol=1e-6)


def test_lj_smooth_spline_caps_blowup():
    lj_raw = LJ13(smooth=False, oscillator=False)
    lj_smooth = LJ13(smooth=True, oscillator=False)
    x = np.zeros((1, 13, 3))
    for i in range(13):
        x[0, i] = [10.0 * i, 0, 0]
    x[0, 1] = [0.3, 0, 0]  # deep in the repulsive core
    e_raw = float(lj_raw.energy(jnp.asarray(x.reshape(1, -1)))[0])
    e_smooth = float(lj_smooth.energy(jnp.asarray(x.reshape(1, -1)))[0])
    assert e_smooth < e_raw  # spline extrapolation grows much slower than r^-12
    assert np.isfinite(e_smooth)


def test_dw4_energy_minimum_at_offset():
    dw = DoubleWell4()
    # pair distance d: single pair energy a(d-d0)^4 + b(d-d0)^2 minimized at
    # (d-d0)² = -b/(2a)
    d_opt = 4.0 + np.sqrt(4.0 / (2 * 0.9))
    x = np.zeros((1, 4, 2))
    x[0, 1] = [d_opt, 0]
    x[0, 2] = [100, 100]
    x[0, 3] = [-100, 100]
    e = dw.energy(jnp.asarray(x.reshape(1, -1)))
    # perturb pair distance -> energy increases
    x2 = x.copy()
    x2[0, 1] = [d_opt + 0.3, 0]
    e2 = dw.energy(jnp.asarray(x2.reshape(1, -1)))
    assert float(e2[0]) > float(e[0])


def test_mean_free_prior(rng):
    prior = MeanFreePrior(n_particles=13, spatial_dim=3, scale=2.0)
    s = prior.sample(rng, 512)
    com = s.reshape(512, 13, 3).mean(axis=1)
    np.testing.assert_allclose(com, 0.0, atol=1e-5)
    lp = prior.log_prob(s)
    assert lp.shape == (512,)
    # log_prob uses (N-1)*D degrees of freedom
    import math

    x0 = jnp.zeros((1, 39))
    expected = -0.5 * 36 * math.log(2 * math.pi * 4.0)
    np.testing.assert_allclose(prior.log_prob(x0)[0], expected, rtol=1e-5)


def test_isotropic_prior_logprob(rng):
    prior = IsotropicGaussianPrior(dim=2, scale=3.0)
    x = jax.random.normal(rng, (16, 2))
    from scipy.stats import multivariate_normal

    ref = multivariate_normal(mean=np.zeros(2), cov=9.0 * np.eye(2)).logpdf(np.asarray(x))
    np.testing.assert_allclose(prior.log_prob(x), ref, rtol=1e-4)


def test_interatomic_dist_shape(rng):
    lj = LJ13()
    x = jax.random.normal(rng, (5, 39))
    d = lj.interatomic_dist(x)
    assert d.shape == (5, 13 * 12 // 2)
    assert bool(jnp.all(d > 0))


def test_split_rhat_detects_disagreement():
    from pita_tpu.baselines.mcmc import split_rhat

    rng = np.random.default_rng(0)
    same = rng.normal(size=(8, 400))
    assert split_rhat(same) < 1.02
    shifted = same + np.linspace(0, 3, 8)[:, None]
    assert split_rhat(shifted) > 1.3


@pytest.mark.slow
def test_reference_protocol_lj13_converges(tmp_path):
    from pita_tpu.baselines.mcmc import generate_lj_dataset_reference_protocol
    from pita_tpu.targets import LJ13

    t = LJ13(temperature=4.0)  # hot rung mixes fast
    data, diag = generate_lj_dataset_reference_protocol(
        t, num_samples=512, n_runs=3, warmup=3000
    )
    assert data.shape == (512, t.dim)
    assert diag["rhat_energy"] < 1.2
