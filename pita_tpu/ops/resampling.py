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


def qmc_resample(key, log_weights: jnp.ndarray):
    """Low-discrepancy categorical resampling (utils.py:102-108 ``sample_cat``).

    The reference inverts the CDF at a Sobol sequence (scipy.qmc on host);
    here the same variance-reduction is achieved on device with a randomized
    van-der-Corput (radical-inverse) sequence — a (0,1)-sequence like Sobol
    in 1D — shifted by a random offset.
    """
    B = log_weights.shape[0]
    # radical inverse base 2 of 0..B-1 via bit reversal (32-bit)
    i = jnp.arange(B, dtype=jnp.uint32)
    v = i
    v = ((v & 0x55555555) << 1) | ((v >> 1) & 0x55555555)
    v = ((v & 0x33333333) << 2) | ((v >> 2) & 0x33333333)
    v = ((v & 0x0F0F0F0F) << 4) | ((v >> 4) & 0x0F0F0F0F)
    v = ((v & 0x00FF00FF) << 8) | ((v >> 8) & 0x00FF00FF)
    v = (v << 16) | (v >> 16)
    u = v.astype(jnp.float32) / jnp.float32(2**32)
    u = (u + jax.random.uniform(key, ())) % 1.0
    w = jnp.clip(jax.nn.softmax(log_weights.astype(jnp.float32)), 1e-6, 1.0)
    cdf = jnp.cumsum(w)
    idx = jnp.searchsorted(cdf, jnp.sort(u), side="left")
    return jnp.clip(idx, 0, B - 1).astype(jnp.int32)


def birth_death_resample(key, accum_birth, accum_death, thresh_times):
    """Birth–death clock resampling (utils.py:123-168 ``sample_birth_death_clocks``,
    global-transition variant): chains whose accumulated death clock passed
    their exponential threshold are replaced by a draw ∝ accumulated birth
    weights; killed chains get fresh Exp(1) thresholds and reset clocks.

    Returns (ids, accum_birth, accum_death, thresh_times, n_killed).
    """
    B = accum_birth.shape[0]
    k_repl, k_thresh = jax.random.split(key)
    death_mask = accum_death >= thresh_times
    probs = accum_birth / jnp.maximum(jnp.sum(accum_birth), 1e-12)
    replace_ids = jax.random.categorical(
        k_repl, jnp.log(jnp.clip(probs, 1e-12, 1.0)), shape=(B,)
    )
    ids = jnp.where(death_mask, replace_ids, jnp.arange(B))
    new_thresh = jax.random.exponential(k_thresh, (B,))
    thresh_times = jnp.where(death_mask, new_thresh, thresh_times)
    accum_birth = jnp.where(death_mask, jnp.zeros_like(accum_birth), accum_birth)
    accum_death = jnp.where(death_mask, jnp.zeros_like(accum_death), accum_death)
    return ids, accum_birth, accum_death, thresh_times, jnp.sum(death_mask)
