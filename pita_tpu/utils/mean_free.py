"""Center-of-mass utilities for particle systems.

Reference parity: ``pita/src/utils/data_utils.py`` (remove_mean) — used
throughout the reference to keep molecular samples on the CoM-free hyperplane.
"""

import jax.numpy as jnp


def remove_mean(x: jnp.ndarray, n_particles: int, n_spatial_dim: int) -> jnp.ndarray:
    """Subtract the per-sample center of mass from flattened particle coords.

    Args:
        x: ``(..., n_particles * n_spatial_dim)`` flattened coordinates.
    Returns:
        Same shape, with zero center of mass per sample.
    """
    shape = x.shape
    x = x.reshape(*shape[:-1], n_particles, n_spatial_dim)
    x = x - jnp.mean(x, axis=-2, keepdims=True)
    return x.reshape(shape)


def remove_mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    """Subtract the mean over the second-to-last axis of ``(..., N, D)`` coords."""
    return x - jnp.mean(x, axis=-2, keepdims=True)
