"""Base Boltzmann target density.

Reference parity: ``pita/src/energies/base_energy_function.py`` — the
reference API is ``__call__(samples, return_force=False) -> log_prob[, force]``
with forces via autograd. Here every target exposes

- ``log_prob(x)``            pure, jittable, ``(..., D) -> (...,)``
- ``score(x)``               ``∇_x log_prob`` via ``jax.grad``
- ``log_prob_and_force(x)``  fused via ``jax.value_and_grad`` so the energy and
                             force come out of one pass (fuses into the sampler
                             ``lax.scan`` — no host/library boundary like the
                             reference's OpenMM bridge, alp_energy.py:122-149).

Temperature enters as ``log_prob = -E(x) / T`` (lennardjones_energy.py:153-155).

Targets are plain Python objects: their parameter arrays are closed over by
jitted callers and embedded as constants (they are small). Dataset handling
(train/val/test splits) mirrors base_energy_function.py:100-126.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class Target:
    """A (possibly tempered) Boltzmann density on R^dim."""

    dim: int
    n_particles: int = 1
    n_spatial_dim: int = 1
    is_molecule: bool = False
    temperature: float = 1.0
    name: str = "target"

    # ---- core density API (override log_prob) ----

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.log_prob(x)

    def score(self, x: jnp.ndarray) -> jnp.ndarray:
        """∇_x log_prob, batched over leading dims."""
        g = jax.grad(lambda xi: jnp.sum(self.log_prob(xi[None])))
        for _ in range(x.ndim - 1):
            g = jax.vmap(g)
        return g(x)

    def log_prob_and_force(self, x: jnp.ndarray):
        """(log_prob, force) in one fused pass; force = ∇_x log_prob."""
        def lp_sum(xx):
            lp = self.log_prob(xx)
            return jnp.sum(lp), lp

        (_, lp), force = jax.value_and_grad(lp_sum, has_aux=True)(x)
        return lp, force

    # ---- dataset API ----

    _train_set: Optional[np.ndarray] = None
    _val_set: Optional[np.ndarray] = None
    _test_set: Optional[np.ndarray] = None

    def setup_train_set(self):
        return None

    def setup_val_set(self):
        return None

    def setup_test_set(self):
        return None

    def _sample_set(self, which: str, key, num: int):
        data = getattr(self, f"_{which}_set")
        if data is None:
            data = getattr(self, f"setup_{which}_set")()
            setattr(self, f"_{which}_set", data)
        if data is None:
            raise ValueError(f"{self.name} has no {which} set")
        idx = jax.random.randint(key, (num,), 0, data.shape[0])
        return jnp.asarray(data)[idx]

    def sample_train_set(self, key, num: int):
        return self._sample_set("train", key, num)

    def sample_val_set(self, key, num: int):
        return self._sample_set("val", key, num)

    def sample_test_set(self, key, num: int):
        return self._sample_set("test", key, num)

    # ---- normalization (base_energy_function.py:53-98) ----

    normalization_min: Optional[float] = None
    normalization_max: Optional[float] = None
    data_normalization_factor: float = 1.0
    should_normalize: bool = False

    def normalize(self, x: jnp.ndarray) -> jnp.ndarray:
        """Affine map to [-1, 1] (non-molecules) or mean-free + scale
        (molecules), matching the reference's dataset normalization."""
        if self.is_molecule:
            from pita_tpu.utils.mean_free import remove_mean

            x = remove_mean(x, self.n_particles, self.n_spatial_dim)
            return x / self.data_normalization_factor
        mins, maxs = self.normalization_min, self.normalization_max
        if mins is None or maxs is None:
            return x
        return 2.0 * (x - mins) / (maxs - mins) - 1.0

    def unnormalize(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.is_molecule:
            return x * self.data_normalization_factor
        mins, maxs = self.normalization_min, self.normalization_max
        if mins is None or maxs is None:
            return x
        return 0.5 * (x + 1.0) * (maxs - mins) + mins

    # ---- geometry helpers (molecules) ----

    def interatomic_dist(self, x: jnp.ndarray) -> jnp.ndarray:
        """Upper-triangle pairwise distances, (B, n_pairs).

        Reference: base_molecule_energy_function.py:104-118.
        """
        B = x.shape[0]
        xr = x.reshape(B, self.n_particles, self.n_spatial_dim)
        diff = xr[:, :, None, :] - xr[:, None, :, :]
        d2 = jnp.sum(diff**2, axis=-1)
        iu = jnp.triu_indices(self.n_particles, k=1)
        return jnp.sqrt(d2[:, iu[0], iu[1]])

    def at_temperature(self, temperature: float) -> "Target":
        """Return a copy of this target at a different temperature."""
        import copy

        new = copy.copy(self)
        new.temperature = float(temperature)
        return new

    def log_on_epoch_end(
        self,
        samples,
        data,
        *,
        prefix: str = "val",
        out_dir=None,
        samples_not_resampled=None,
        make_plots: bool = False,
    ) -> dict:
        """Target-specific evaluation hook called from trainer.evaluate/test.

        Reference: ``BaseEnergyFunction.log_on_epoch_end`` (:157-164) and its
        overrides (ALP Ramachandran/TICA/chirality, alp_energy.py:190-291; GMM
        contours). Base targets log nothing extra — the trainer already
        computes energy/distance metrics.
        """
        return {}
