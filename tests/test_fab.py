"""FAB library: AIS log-Z recovery, transition operators, targets
(reference fab/fab/sampling_methods/ais_test.py capability)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pita_tpu.fab import (
    AISConfig,
    annealed_importance_sampling,
    metropolis_transition,
    hmc_transition,
    ManyWell,
    GaussianTarget,
)


def test_ais_recovers_log_Z_of_normalized_target(rng):
    """AIS from N(0, 2²I) to a normalized N(1, I): log Z must be ≈ 0."""
    base = GaussianTarget(mean=jnp.zeros(2), scale=jnp.full(2, 2.0))
    target = GaussianTarget(mean=jnp.ones(2), scale=jnp.ones(2))
    cfg = AISConfig(n_intermediate_distributions=16, transition="hmc", n_inner_steps=3)
    res = annealed_importance_sampling(
        rng, base.sample_and_log_prob, base.log_prob, target.log_prob, 2048, cfg
    )
    assert abs(float(res.log_Z)) < 0.1, float(res.log_Z)
    assert float(res.ess_ais) > float(res.ess_base)
    m = np.average(np.asarray(res.samples), axis=0,
                   weights=np.asarray(jax.nn.softmax(res.log_w)))
    np.testing.assert_allclose(m, 1.0, atol=0.15)


def test_ais_geometric_spacing(rng):
    base = GaussianTarget(mean=jnp.zeros(2), scale=jnp.full(2, 2.0))
    target = GaussianTarget(mean=jnp.zeros(2), scale=jnp.full(2, 0.5))
    cfg = AISConfig(
        n_intermediate_distributions=16,
        distribution_spacing_type="geometric",
        transition="metropolis",
        n_inner_steps=5,
    )
    res = annealed_importance_sampling(
        rng, base.sample_and_log_prob, base.log_prob, target.log_prob, 1024, cfg
    )
    assert abs(float(res.log_Z)) < 0.15


def test_metropolis_transition_mixes(rng):
    target = GaussianTarget(mean=jnp.zeros(2), scale=jnp.ones(2))
    x0 = jnp.full((1024, 2), 4.0)
    x, acc = metropolis_transition(rng, x0, target.log_prob, 300, 0.5)
    assert 0.1 < float(acc) < 0.95
    np.testing.assert_allclose(np.asarray(x).mean(0), 0.0, atol=0.3)


def test_hmc_transition_mixes(rng):
    target = GaussianTarget(mean=jnp.zeros(4), scale=jnp.ones(4))
    x0 = jnp.full((512, 4), 3.0)
    x, acc = hmc_transition(rng, x0, target.log_prob, 50, 0.2, n_leapfrog=5)
    assert float(acc) > 0.3
    np.testing.assert_allclose(np.asarray(x).var(0), 1.0, rtol=0.3)


def test_many_well_structure(rng):
    mw = ManyWell(dim=8)
    modes = mw.mode_locations()
    assert modes.shape == (16, 8)
    # modes are local maxima of log_prob: perturbations decrease it
    lp_modes = mw.log_prob(jnp.asarray(modes))
    lp_pert = mw.log_prob(jnp.asarray(modes) + 0.3)
    assert bool(jnp.all(lp_modes > lp_pert))
    # temperature scaling
    mw2 = ManyWell(dim=8, temperature=2.0)
    x = jax.random.normal(rng, (4, 8))
    np.testing.assert_allclose(mw.log_prob(x) / 2, mw2.log_prob(x), rtol=1e-5)
