"""Variance-exploding noise schedules as pure functions of t.

Reference parity: ``pita/src/models/components/noise_schedules.py``.
Each schedule provides

- ``g(t)``    — diffusion coefficient,
- ``h(t)``    — accumulated variance ``∫_0^t g(s)^2 ds`` (EDM: sigma(t)^2),
- and for schedules that support it, ``t(h)`` (inverse), ``dh_dt``,
  ``sample_ln_sigma`` for training-time noise-level sampling, and
  stratification bin edges for diagnostics.

All schedules are frozen dataclasses: hashable, so they can be closed over by
``jax.jit`` as static configuration; every method is pure jnp math and safe
inside ``jit``/``scan``/``grad``.
"""

import dataclasses
import math

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """Base class; subclasses define g(t) and h(t)."""

    def g(self, t):
        raise NotImplementedError

    def h(self, t):
        raise NotImplementedError

    def dh_dt(self, t):
        """Default: autodiff of h."""
        return jax.grad(lambda s: jnp.sum(self.h(s)))(t)

    def t(self, ht):
        raise NotImplementedError(f"{type(self).__name__} has no analytic inverse h^-1")


@dataclasses.dataclass(frozen=True)
class LinearNoiseSchedule(NoiseSchedule):
    """h(t) = beta * t (reference noise_schedules.py:19-27)."""

    beta: float

    def g(self, t):
        return jnp.full_like(t, self.beta**0.5)

    def h(self, t):
        return self.beta * t

    def dh_dt(self, t):
        return jnp.full_like(t, self.beta)

    def t(self, ht):
        return ht / self.beta


@dataclasses.dataclass(frozen=True)
class QuadraticNoiseSchedule(NoiseSchedule):
    """h(t) = beta * t^2 (reference noise_schedules.py:30-38)."""

    beta: float

    def g(self, t):
        return jnp.sqrt(self.beta * 2 * t)

    def h(self, t):
        return self.beta * t**2

    def dh_dt(self, t):
        return 2 * self.beta * t

    def t(self, ht):
        return jnp.sqrt(ht / self.beta)


@dataclasses.dataclass(frozen=True)
class PowerNoiseSchedule(NoiseSchedule):
    """h(t) = beta * t^power (reference noise_schedules.py:41-50)."""

    beta: float
    power: float

    def g(self, t):
        return jnp.sqrt(self.beta * self.power * t ** (self.power - 1))

    def h(self, t):
        return self.beta * t**self.power

    def dh_dt(self, t):
        return self.beta * self.power * t ** (self.power - 1)

    def t(self, ht):
        return (ht / self.beta) ** (1.0 / self.power)


@dataclasses.dataclass(frozen=True)
class SubLinearNoiseSchedule(NoiseSchedule):
    """h(t) = beta * sqrt(t) (reference noise_schedules.py:53-61)."""

    beta: float

    def g(self, t):
        return jnp.sqrt(self.beta * 0.5 / (t**0.5 + 1e-3))

    def h(self, t):
        return self.beta * t**0.5

    def t(self, ht):
        return (ht / self.beta) ** 2


@dataclasses.dataclass(frozen=True)
class GeometricNoiseSchedule(NoiseSchedule):
    """EDM eq. 192/199 geometric schedule (reference noise_schedules.py:64-95)."""

    sigma_min: float
    sigma_max: float

    @property
    def sigma_diff(self):
        return self.sigma_max / self.sigma_min

    def g(self, t):
        return self.sigma_min * (self.sigma_diff**t) * math.sqrt(2 * math.log(self.sigma_diff))

    def h(self, t):
        return (self.sigma_min * ((self.sigma_diff ** (2 * t)) - 1) ** 0.5) ** 2

    def dh_dt(self, t):
        return self.g(t) ** 2

    def t(self, ht):
        # invert h: sigma_diff^{2t} = ht / sigma_min^2 + 1
        return jnp.log(ht / self.sigma_min**2 + 1.0) / (2 * math.log(self.sigma_diff))

    def sample_ln_sigma(self, key, num_samples):
        """ln sigma ~ U[ln sigma_min, ln sigma_max]."""
        lo, hi = math.log(self.sigma_min), math.log(self.sigma_max)
        return jax.random.uniform(key, (num_samples,), minval=lo, maxval=hi)

    def ln_sigma_bins(self, num_bins):
        return jnp.linspace(math.log(self.sigma_min), math.log(self.sigma_max), num_bins + 1)


@dataclasses.dataclass(frozen=True)
class ElucidatingNoiseSchedule(NoiseSchedule):
    """Karras rho-schedule with log-normal ln-sigma training sampler
    (reference noise_schedules.py:98-138; defaults from
    configs/model/noise_schedule/elucidating.yaml)."""

    sigma_min: float = 0.002
    sigma_max: float = 80.0
    rho: float = 7.0
    P_mean: float = -1.2
    P_std: float = 1.2

    @property
    def term1(self):
        return self.sigma_max ** (1 / self.rho)

    @property
    def term2(self):
        return self.sigma_min ** (1 / self.rho) - self.sigma_max ** (1 / self.rho)

    def g(self, t):
        return (
            -2 * self.rho * (self.term1 + (1 - t) * self.term2) ** (2 * self.rho - 1) * self.term2
        ) ** 0.5

    def h(self, t):
        return (self.term1 + (1 - t) * self.term2) ** (2 * self.rho)

    def t(self, ht):
        return 1 - ((ht ** (1 / (2 * self.rho)) - self.term1) / self.term2)

    def dh_dt(self, t):
        return (
            -2 * self.rho * self.term2 * (self.term1 + (1 - t) * self.term2) ** (2 * self.rho - 1)
        )

    def sample_ln_sigma(self, key, num_samples):
        """ln sigma ~ N(P_mean, P_std^2)."""
        return jax.random.normal(key, (num_samples,)) * self.P_std + self.P_mean

    def ln_sigma_bins(self, num_bins):
        return jnp.linspace(
            self.P_mean - 2 * self.P_std, self.P_mean + 2 * self.P_std, num_bins + 1
        )
