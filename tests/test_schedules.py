"""Noise/annealing schedule correctness: h' == g², inverses, samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pita_tpu.schedules import (
    ElucidatingNoiseSchedule,
    GeometricNoiseSchedule,
    LinearNoiseSchedule,
    QuadraticNoiseSchedule,
    PowerNoiseSchedule,
    ConstantAnnealingSchedule,
    LinearAnnealingSchedule,
    SigmoidAnnealingSchedule,
)

SCHEDULES = [
    LinearNoiseSchedule(beta=2.0),
    QuadraticNoiseSchedule(beta=1.5),
    PowerNoiseSchedule(beta=1.2, power=3.0),
    GeometricNoiseSchedule(sigma_min=0.05, sigma_max=10.0),
    ElucidatingNoiseSchedule(sigma_min=0.05, sigma_max=80.0, rho=7.0),
]


@pytest.mark.parametrize("sched", SCHEDULES, ids=lambda s: type(s).__name__)
def test_g_squared_is_dh_dt(sched):
    """h(t) = ∫ g² means dh/dt == g(t)² (noise_schedules.py:14-15)."""
    t = jnp.linspace(0.1, 0.9, 17)
    dh = jax.vmap(jax.grad(lambda s: sched.h(s)))(t)
    np.testing.assert_allclose(dh, sched.g(t) ** 2, rtol=2e-3)


@pytest.mark.parametrize(
    "sched",
    [s for s in SCHEDULES if type(s).__name__ != "SubLinearNoiseSchedule"],
    ids=lambda s: type(s).__name__,
)
def test_inverse(sched):
    t = jnp.linspace(0.1, 0.9, 9)
    np.testing.assert_allclose(sched.t(sched.h(t)), t, rtol=1e-4, atol=1e-5)


def test_elucidating_matches_reference_values():
    """Spot-check against the closed form in noise_schedules.py:108-125."""
    s = ElucidatingNoiseSchedule(sigma_min=0.002, sigma_max=80.0, rho=7.0)
    term1 = 80.0 ** (1 / 7.0)
    term2 = 0.002 ** (1 / 7.0) - 80.0 ** (1 / 7.0)
    t = 0.3
    expected_h = (term1 + (1 - t) * term2) ** 14
    np.testing.assert_allclose(s.h(jnp.asarray(t)), expected_h, rtol=1e-5)
    # reverse time: t=1 is the high-noise start (h=sigma_max²), t=0 the end
    np.testing.assert_allclose(s.h(jnp.asarray(1.0)), 80.0**2, rtol=1e-3)
    np.testing.assert_allclose(s.h(jnp.asarray(0.0)), 0.002**2, rtol=1e-3)


def test_ln_sigma_sampler_stats(rng):
    s = ElucidatingNoiseSchedule()
    ln_sigma = s.sample_ln_sigma(rng, 20000)
    assert abs(float(ln_sigma.mean()) - s.P_mean) < 0.05
    assert abs(float(ln_sigma.std()) - s.P_std) < 0.05


def test_annealing_schedules_interpolate():
    for sched in [
        ConstantAnnealingSchedule(annealing_factor=2.0),
        LinearAnnealingSchedule(annealing_factor=2.0),
        SigmoidAnnealingSchedule(annealing_factor=2.0, sharpness=10.0),
    ]:
        g1 = float(sched.gamma(jnp.asarray(1.0)))
        g0 = float(sched.gamma(jnp.asarray(0.0)))
        if isinstance(sched, ConstantAnnealingSchedule):
            assert g1 == g0 == 2.0
        else:
            assert abs(g1 - 1.0) < 0.01 and abs(g0 - 2.0) < 0.01


def test_annealing_dgamma_matches_autodiff():
    for sched in [
        LinearAnnealingSchedule(annealing_factor=3.0),
        SigmoidAnnealingSchedule(annealing_factor=3.0, sharpness=8.0),
    ]:
        t = jnp.linspace(0.05, 0.95, 13)
        ad = jax.vmap(jax.grad(lambda s: sched.gamma(s).sum()))(t)
        np.testing.assert_allclose(sched.dgamma_dt(t), ad, rtol=1e-3, atol=1e-5)
