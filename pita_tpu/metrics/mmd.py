"""Maximum mean discrepancy kernels.

Reference parity: ``pita/src/models/components/mmd.py:16-183`` — linear,
polynomial, and RBF-mixture MMD² (biased estimator over a bandwidth ladder).
Pure jnp; the Gram matrices are single batched matmuls on the MXU.
"""

import jax.numpy as jnp


def _sq_dists(x, y):
    xx = jnp.sum(x**2, axis=-1)
    yy = jnp.sum(y**2, axis=-1)
    xy = x @ y.T
    return xx[:, None] + yy[None, :] - 2 * xy


def linear_mmd2(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    delta = jnp.mean(x, axis=0) - jnp.mean(y, axis=0)
    return jnp.dot(delta, delta)


def poly_mmd2(x, y, d: int = 2, alpha: float = 1.0, c: float = 2.0):
    K_xx = (alpha * x @ x.T + c) ** d
    K_yy = (alpha * y @ y.T + c) ** d
    K_xy = (alpha * x @ y.T + c) ** d
    return jnp.mean(K_xx) + jnp.mean(K_yy) - 2 * jnp.mean(K_xy)


def mix_rbf_mmd2(x, y, sigmas=(0.01, 0.1, 1.0, 10.0, 100.0)):
    """RBF-mixture MMD² over a bandwidth ladder (mmd.py:59-79 capability)."""
    d_xx = _sq_dists(x, x)
    d_yy = _sq_dists(y, y)
    d_xy = _sq_dists(x, y)
    total = 0.0
    for s in sigmas:
        gamma = 1.0 / (2 * s**2)
        total = total + (
            jnp.mean(jnp.exp(-gamma * d_xx))
            + jnp.mean(jnp.exp(-gamma * d_yy))
            - 2 * jnp.mean(jnp.exp(-gamma * d_xy))
        )
    return total
