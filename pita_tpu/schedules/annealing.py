"""Annealing-factor schedules gamma(t) with analytic dgamma/dt.

Reference parity: ``pita/src/models/components/annealing_factor_schedules.py``.
gamma interpolates from 1 (at the start of reverse-time integration, t=1) to
``annealing_factor`` = beta_low / beta_high (at t=0), scaling the learned
energy so the SDE targets the *lower* temperature.
"""

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AnnealingSchedule:
    annealing_factor: float = 1.0

    def gamma(self, t):
        raise NotImplementedError

    def dgamma_dt(self, t):
        raise NotImplementedError

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class ConstantAnnealingSchedule(AnnealingSchedule):
    """gamma(t) = annealing_factor (reference :20-32)."""

    def gamma(self, t):
        return jnp.ones_like(jnp.asarray(t, dtype=jnp.float32)) * self.annealing_factor

    def dgamma_dt(self, t):
        return jnp.zeros_like(jnp.asarray(t, dtype=jnp.float32))


@dataclasses.dataclass(frozen=True)
class LinearAnnealingSchedule(AnnealingSchedule):
    """Piecewise-linear interpolation start→target over [t_start, t_end]
    in *reverse* time (t_start=1 → t_end=0) (reference :35-69)."""

    annealing_factor_start: float = 1.0
    t_start: float = 1.0
    t_end: float = 0.0

    def _slope(self):
        return (self.annealing_factor - self.annealing_factor_start) / (self.t_end - self.t_start)

    def gamma(self, t):
        t = jnp.asarray(t, dtype=jnp.float32)
        linear = self._slope() * (t - self.t_start) + self.annealing_factor_start
        return jnp.where(
            t > self.t_start,
            self.annealing_factor_start,
            jnp.where(t < self.t_end, self.annealing_factor, linear),
        )

    def dgamma_dt(self, t):
        t = jnp.asarray(t, dtype=jnp.float32)
        return jnp.where(
            (t > self.t_start) | (t < self.t_end), jnp.zeros_like(t), self._slope()
        )


@dataclasses.dataclass(frozen=True)
class SigmoidAnnealingSchedule:
    """Smooth sigmoid transition with configurable sharpness (reference :72-109)."""

    annealing_factor: float = 1.0
    annealing_factor_start: float = 1.0
    t_start: float = 1.0
    t_end: float = 0.0
    sharpness: float = 10.0

    @property
    def center(self):
        return (self.t_start + self.t_end) / 2

    @property
    def width(self):
        return self.t_start - self.t_end

    def _smooth(self, t):
        x = (self.center - t) / self.width
        return 1.0 / (1.0 + jnp.exp(-self.sharpness * x))

    def gamma(self, t):
        t = jnp.asarray(t, dtype=jnp.float32)
        return self.annealing_factor_start + (
            self.annealing_factor - self.annealing_factor_start
        ) * self._smooth(t)

    def dgamma_dt(self, t):
        # NOTE: the reference (annealing_factor_schedules.py:98-109) drops the
        # minus sign from d/dt sigmoid((center-t)/width) — a latent bug (its
        # experiments only use the constant schedule). We return the true
        # derivative, consistent with autodiff of gamma().
        t = jnp.asarray(t, dtype=jnp.float32)
        smooth = self._smooth(t)
        d_smooth_dt = -(self.sharpness / self.width) * smooth * (1 - smooth)
        return (self.annealing_factor - self.annealing_factor_start) * d_smooth_dt

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)
