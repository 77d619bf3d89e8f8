"""Monte-Carlo noised-energy/score estimators (iDEM).

Reference parity: ``pita/src/models/components/score_estimator.py`` —
``R_t(x) = log E_ε[exp(log p(x + sqrt(h)·ε))]`` over ``num_mc_samples``
Gaussian probes, its gradient (the DEM score target), and Richardson
extrapolation. Rebuilt with ``jax.vmap(jax.grad(...))`` over pure functions;
the probe batch is one fused sampling+logsumexp program on device.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp


def log_expectation_reward(key, ht, x, log_prob_fn, num_mc_samples, min_log_reward=None):
    """R_t for one sample x (D,) at noise level ht (score_estimator.py:21-38)."""
    eps = jax.random.normal(key, (num_mc_samples, x.shape[-1]), x.dtype)
    samples = x[None, :] + eps * jnp.sqrt(ht)
    log_rewards = log_prob_fn(samples)
    if min_log_reward is not None:
        log_rewards = jnp.maximum(log_rewards, min_log_reward)
    return jax.scipy.special.logsumexp(log_rewards, axis=0) - math.log(num_mc_samples)


def estimate_Rt(key, ht, x, log_prob_fn, num_mc_samples, min_log_reward=None):
    """Batched R_t estimate; ht (B,), x (B,D) (score_estimator.py:55-67)."""
    keys = jax.random.split(key, x.shape[0])
    f = partial(
        log_expectation_reward,
        log_prob_fn=log_prob_fn,
        num_mc_samples=num_mc_samples,
        min_log_reward=min_log_reward,
    )
    return jax.vmap(f)(keys, ht, x)


def estimate_grad_Rt(key, ht, x, log_prob_fn, num_mc_samples, min_log_reward=None):
    """∇_x R_t — the DEM score target (score_estimator.py:41-52)."""
    keys = jax.random.split(key, x.shape[0])

    def one(k, h, xi):
        return jax.grad(
            lambda xx: log_expectation_reward(
                k, h, xx, log_prob_fn, num_mc_samples, min_log_reward
            )
        )(xi)

    return jax.vmap(one)(keys, ht, x)


def wrap_for_richardsons(estimator):
    """Richardson extrapolation: 2·est(K) − est(K/2) (score_estimator.py:8-18)."""

    def _fxn(key, ht, x, log_prob_fn, num_mc_samples, **kw):
        k1, k2 = jax.random.split(key)
        big = estimator(k1, ht, x, log_prob_fn, num_mc_samples, **kw)
        small = estimator(k2, ht, x, log_prob_fn, num_mc_samples // 2, **kw)
        return 2 * big - small

    return _fxn


def clip_scores(scores, max_norm, n_particles=None, n_spatial_dim=None):
    """Per-particle score-norm clipping (clipper.py:38-50)."""
    eps = 1e-6
    if n_particles is not None and n_particles > 1:
        shape = scores.shape
        s = scores.reshape(-1, n_particles, n_spatial_dim)
        norms = jnp.linalg.norm(s, axis=-1)
        coef = jnp.clip(max_norm / (norms + eps), max=1.0)
        return (s * coef[..., None]).reshape(shape)
    norms = jnp.linalg.norm(scores, axis=-1, keepdims=True)
    coef = jnp.clip(max_norm / (norms + eps), max=1.0)
    return scores * coef
