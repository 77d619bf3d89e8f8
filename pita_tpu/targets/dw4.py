"""DW4: four particles in 2D with pairwise double-well interactions.

Capability parity with the DEM/EACF lineage the reference builds on (the
driver's benchmark config list includes DW4): pair energy
``a*(d-d0)^4 + b*(d-d0)^2 + c`` summed over ordered pairs (matching the
bgflow ``MultiDoubleWellPotential`` convention the reference's LJ target uses
for pair enumeration), tempered as ``log_prob = -E/T``.
"""

import jax.numpy as jnp

from pita_tpu.targets.base import Target


class DoubleWell4(Target):
    is_molecule = True
    name = "dw4"

    def __init__(
        self,
        n_particles: int = 4,
        n_spatial_dim: int = 2,
        a: float = 0.9,
        b: float = -4.0,
        c: float = 0.0,
        offset: float = 4.0,
        temperature: float = 1.0,
    ):
        self.n_particles = n_particles
        self.n_spatial_dim = n_spatial_dim
        self.dim = n_particles * n_spatial_dim
        self.a, self.b, self.c, self.offset = a, b, c, offset
        self.temperature = float(temperature)

    def energy(self, x: jnp.ndarray) -> jnp.ndarray:
        shape = x.shape[:-1]
        xr = x.reshape(*shape, self.n_particles, self.n_spatial_dim)
        diff = xr[..., :, None, :] - xr[..., None, :, :]
        d2 = jnp.sum(diff**2, axis=-1)
        eye = jnp.eye(self.n_particles, dtype=bool)
        d = jnp.sqrt(jnp.where(eye, 1.0, d2))
        dd = d - self.offset
        e_pair = self.a * dd**4 + self.b * dd**2 + self.c
        # ordered pairs double-count, then halve: bgflow convention applies 0.5
        return 0.5 * jnp.sum(jnp.where(eye, 0.0, e_pair), axis=(-2, -1))

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        return -self.energy(x) / self.temperature
