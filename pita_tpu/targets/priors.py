"""Priors for the reverse-SDE start state.

Reference parity: ``pita/src/energies/base_prior.py``. The sampler starts from
an isotropic Gaussian at scale ``sqrt(h(t_start) / gamma(t_start))``
(energytemp_module.py:214-221,250-257); for molecules the Gaussian is projected
onto the CoM-free hyperplane with an (N-1)*D-degrees-of-freedom log-density
(base_prior.py:49-83).
"""

import math

import jax
import jax.numpy as jnp


class IsotropicGaussianPrior:
    """N(0, scale^2 I) on R^dim (base_prior.py:37-40)."""

    def __init__(self, dim: int, scale: float):
        self.dim = dim
        self.scale = scale

    def sample(self, key, num_samples: int) -> jnp.ndarray:
        return jax.random.normal(key, (num_samples, self.dim)) * self.scale

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        r2 = jnp.sum(x**2, axis=-1) / self.scale**2
        logz = -0.5 * self.dim * math.log(2 * math.pi * self.scale**2)
        return -0.5 * r2 + logz


class MeanFreePrior:
    """Gaussian projected on the CoM-free hyperplane (base_prior.py:49-83)."""

    def __init__(self, n_particles: int, spatial_dim: int, scale: float):
        self.n_particles = n_particles
        self.spatial_dim = spatial_dim
        self.dim = n_particles * spatial_dim
        self.scale = scale

    def sample(self, key, num_samples: int) -> jnp.ndarray:
        x = jax.random.normal(key, (num_samples, self.n_particles, self.spatial_dim))
        x = x * self.scale
        x = x - jnp.mean(x, axis=-2, keepdims=True)
        return x.reshape(num_samples, self.dim)

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        xr = x.reshape(*x.shape[:-1], self.n_particles, self.spatial_dim)
        r2 = jnp.sum(xr**2, axis=(-1, -2)) / self.scale**2
        dof = (self.n_particles - 1) * self.spatial_dim
        logz = -0.5 * dof * math.log(2 * math.pi * self.scale**2)
        return -0.5 * r2 + logz


def Prior(
    scale: float,
    n_particles: int = None,
    spatial_dim: int = None,
    dim: int = None,
    should_mean_free: bool = True,
):
    """Factory matching the reference's ``Prior`` dispatch (base_prior.py:8-46)."""
    if should_mean_free:
        assert n_particles is not None and spatial_dim is not None
        return MeanFreePrior(n_particles, spatial_dim, scale)
    if dim is None:
        dim = n_particles * spatial_dim
    return IsotropicGaussianPrior(dim, scale)
