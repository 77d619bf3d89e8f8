"""Effective sample size of importance weights.

Reference parity: ``fab/fab/utils/numerical.py:21-34`` —
ESS = 1 / E[w̄²] with normalized importance weights, computed in log space.
"""

import jax.numpy as jnp
from jax.scipy.special import logsumexp


def log_effective_sample_size(log_w: jnp.ndarray) -> jnp.ndarray:
    """log ESS (normalized to [0, log N])."""
    log_norm = log_w - logsumexp(log_w)
    return -logsumexp(2 * log_norm)


def effective_sample_size(log_w: jnp.ndarray, normalize: bool = False) -> jnp.ndarray:
    ess = jnp.exp(log_effective_sample_size(log_w))
    if normalize:
        ess = ess / log_w.shape[0]
    return ess
