"""FAB target distributions.

Reference parity: ``fab/fab/target_distributions/`` — the 2D double-well
(``E(x) = a·x1 + b·x1² + c·x1⁴ + ½x2²`` with a=-0.5, b=-6, c=1,
double_well.py:32-58), the ManyWell product over dim/2 independent wells
(many_well.py:14-96), and a diagonal Gaussian target. GMM lives in
``pita_tpu.targets.gmm``.
"""

import math

import jax
import jax.numpy as jnp

from pita_tpu.targets.base import Target


class DoubleWell1D:
    """The 1D marginal double well (first coordinate of the 2D well)."""

    def __init__(self, a=-0.5, b=-6.0, c=1.0):
        self.a, self.b, self.c = a, b, c

    def energy(self, x1):
        return self.a * x1 + self.b * x1**2 + self.c * x1**4


class ManyWell(Target):
    """Product of dim/2 independent 2D double wells (many_well.py)."""

    is_molecule = False
    name = "many_well"

    def __init__(self, dim: int = 32, a=-0.5, b=-6.0, c=1.0, temperature: float = 1.0):
        assert dim % 2 == 0
        self.dim = dim
        self.n_wells = dim // 2
        self.a, self.b, self.c = a, b, c
        self.temperature = float(temperature)

    def energy(self, x):
        x1 = x[..., 0::2]
        x2 = x[..., 1::2]
        e1 = self.a * x1 + self.b * x1**2 + self.c * x1**4
        e2 = 0.5 * x2**2
        return jnp.sum(e1 + e2, axis=-1)

    def log_prob(self, x):
        return -self.energy(x) / self.temperature

    def mode_locations(self):
        """The 2^n_wells modes: x1 ≈ ±1.7 per well, x2 = 0 (many_well.py:67-79)."""
        import numpy as np

        # solve dE/dx1 = a + 2b x1 + 4c x1³ = 0 numerically for both wells
        roots = np.roots([4 * self.c, 0.0, 2 * self.b, self.a])
        real = np.sort(roots[np.abs(roots.imag) < 1e-9].real)
        lo, hi = real[0], real[-1]
        modes = []
        for bits in range(2**self.n_wells):
            m = np.zeros(self.dim)
            for w in range(self.n_wells):
                m[2 * w] = hi if (bits >> w) & 1 else lo
            modes.append(m)
        return np.stack(modes)


class GaussianTarget(Target):
    """Diagonal Gaussian target (fab target_distributions/gaussian.py)."""

    is_molecule = False
    name = "gaussian"

    def __init__(self, mean, scale, temperature: float = 1.0):
        self.mean = jnp.asarray(mean, jnp.float32)
        self.scale = jnp.asarray(scale, jnp.float32)
        self.dim = int(self.mean.shape[-1])
        self.temperature = float(temperature)

    def log_prob(self, x):
        z = (x - self.mean) / self.scale
        lp = -0.5 * jnp.sum(z**2, axis=-1) - jnp.sum(jnp.log(self.scale)) - (
            0.5 * self.dim * math.log(2 * math.pi)
        )
        return lp / self.temperature

    def sample(self, key, num_samples: int):
        eps = jax.random.normal(key, (num_samples, self.dim))
        return self.mean + self.scale * eps

    def sample_and_log_prob(self, key, num_samples: int):
        x = self.sample(key, num_samples)
        return x, self.log_prob(x)
