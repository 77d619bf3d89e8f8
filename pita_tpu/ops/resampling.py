"""On-device SMC resampling.

Reference parity: ``pita/src/models/components/utils.py:102-168``. The
reference drops to NumPy on CPU for ``np.digitize`` every resampling step
(utils.py:117) — a per-step device→host sync. Here everything is a pure jnp
program that lives inside the sampler's ``lax.scan``:

- ``systematic_resample``: softmax the log-weights (clipped to [1e-6, 1] like
  the reference), build the CDF, and invert it at the systematic-uniform grid
  ``(u0 + i/B) mod 1`` via ``searchsorted``.
- ``count_unique``: number of distinct ancestors after resampling, computed by
  a scatter of ones (the reference uses ``len(np.unique(...))`` on host).
"""

import jax
import jax.numpy as jnp


def systematic_resample(key, log_weights: jnp.ndarray):
    """Systematic categorical resampling (utils.py:111-120).

    Args:
        key: PRNG key (a single shared key gives bit-identical choices on all
            devices — required for distributed resampling determinism).
        log_weights: (B,) unnormalized log-weights.
    Returns:
        idx: (B,) int32 ancestor indices.
    """
    B = log_weights.shape[0]
    u0 = jax.random.uniform(key, (), dtype=jnp.float32)
    u = (u0 + jnp.arange(B, dtype=jnp.float32) / B) % 1.0
    w = jnp.clip(jax.nn.softmax(log_weights.astype(jnp.float32)), 1e-6, 1.0)
    cdf = jnp.cumsum(w)
    # np.digitize(u, bins, right=True) == searchsorted(bins, u, side='left')
    idx = jnp.searchsorted(cdf, u, side="left")
    return jnp.clip(idx, 0, B - 1).astype(jnp.int32)


def count_unique(idx: jnp.ndarray, size: int) -> jnp.ndarray:
    """Number of distinct values in ``idx`` (all < size), on-device."""
    hits = jnp.zeros((size,), dtype=jnp.int32).at[idx].set(1)
    return jnp.sum(hits)
