"""Data augmentation: random SO(3) rotations and CoM jitter.

Reference parity: ``pita/src/energies/components/rotation.py`` (uniform SO(3)
via quaternions / QR; applied to coordinates *and* forces per training batch,
energytemp_module.py:718-721) and ``center_of_mass.py`` (Gaussian CoM shift
with σ = 1/sqrt(N·d)). Pure jnp, safe inside the jitted train step — unlike
the reference, which draws rotations host-side via scipy each step.
"""

import jax
import jax.numpy as jnp


def random_rotations(key, batch_size: int, dim: int = 3) -> jnp.ndarray:
    """Uniform random rotation matrices via QR of Gaussians (rotation.py:37-49)."""
    A = jax.random.normal(key, (batch_size, dim, dim))
    Q, R = jnp.linalg.qr(A)
    # make the factorization unique (R diag > 0) => Haar-uniform O(dim)
    Q = Q * jnp.sign(jnp.diagonal(R, axis1=-2, axis2=-1))[:, None, :]
    # ensure proper rotations (det = +1)
    d = jnp.sign(jnp.linalg.det(Q))
    Q = Q.at[:, :, 0].multiply(d[:, None])
    return Q


def rotate_augment(key, x, force, n_particles: int, n_spatial_dim: int):
    """Apply one random rotation per sample to x (and force) (rotation.py:52-78)."""
    B = x.shape[0]
    rot = random_rotations(key, B, n_spatial_dim)
    xr = x.reshape(B, n_particles, n_spatial_dim)
    x_out = jnp.einsum("bij,bki->bkj", rot, xr).reshape(B, -1)
    if force is None:
        return x_out, None
    fr = force.reshape(B, n_particles, n_spatial_dim)
    f_out = jnp.einsum("bij,bki->bkj", rot, fr).reshape(B, -1)
    return x_out, f_out


def com_augment(key, x, n_particles: int, n_spatial_dim: int):
    """Gaussian CoM jitter with σ = 1/sqrt(N·d) (center_of_mass.py:7-30)."""
    B = x.shape[0]
    std = 1.0 / jnp.sqrt(float(n_particles * n_spatial_dim))
    noise = jax.random.normal(key, (B, 1, n_spatial_dim), x.dtype) * std
    xr = x.reshape(B, n_particles, n_spatial_dim) + noise
    return xr.reshape(B, -1)
