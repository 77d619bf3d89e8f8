"""Annealed importance sampling (the vendored-FAB capability surface).

Reference parity: ``fab/fab/sampling_methods/ais.py:18-238`` — AIS from a base
distribution to the target (or the α-divergence target g ∝ p^α q^{1-α}) over a
linear or geometric β ladder, with MCMC transitions at each rung, ESS and
log-Z accumulation, and non-finite-weight filtering.

Rebuilt as one jitted ``lax.scan`` over the ladder: intermediate log-density
log π_j = (1-β_j)·log q + β_j·log target, per-rung Metropolis or HMC sweeps,
weight increments between consecutive rungs — no per-rung host sync. NaN
chains are weight-masked instead of dropped (static shapes).
"""

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pita_tpu.fab.transition_operators import hmc_transition, metropolis_transition
from pita_tpu.metrics.ess import effective_sample_size


@dataclasses.dataclass(frozen=True)
class AISConfig:
    n_intermediate_distributions: int = 8
    distribution_spacing_type: str = "linear"  # or "geometric"
    transition: str = "hmc"  # or "metropolis"
    n_inner_steps: int = 5
    step_size: float = 0.2
    n_leapfrog: int = 5
    p_target: bool = True
    alpha: Optional[float] = None  # AIS to g ∝ p^α q^{1-α} when p_target=False


class AISResult(NamedTuple):
    samples: jnp.ndarray
    log_w: jnp.ndarray
    ess_base: jnp.ndarray
    ess_ais: jnp.ndarray
    log_Z: jnp.ndarray


def beta_spacing(cfg: AISConfig) -> np.ndarray:
    """β ladder incl. endpoints (ais.py:113-135: linear, or the AIS-paper
    geometric heuristic — a quarter linear in [0, 0.01], rest log-spaced)."""
    n = cfg.n_intermediate_distributions
    if cfg.distribution_spacing_type == "linear":
        return np.linspace(0.0, 1.0, n + 2)
    n_low = max((n + 2) // 4, 1)
    betas_low = np.linspace(0.0, 0.01, n_low, endpoint=False)
    betas_high = np.geomspace(0.01, 1.0, (n + 2) - n_low)
    return np.concatenate([betas_low, betas_high])


def annealed_importance_sampling(
    key,
    base_sample_and_log_prob: Callable,
    base_log_prob: Callable,
    target_log_prob: Callable,
    batch_size: int,
    cfg: AISConfig = AISConfig(),
) -> AISResult:
    """Run AIS; returns final points, log-weights, ESS and log-Z estimates."""
    if not cfg.p_target:
        assert cfg.alpha is not None
        tgt = lambda x: cfg.alpha * target_log_prob(x) + (1 - cfg.alpha) * base_log_prob(x)
    else:
        tgt = target_log_prob

    def intermediate(x, beta):
        return (1 - beta) * base_log_prob(x) + beta * tgt(x)

    betas = jnp.asarray(beta_spacing(cfg))

    k_init, k_scan = jax.random.split(key)
    x, log_q0 = base_sample_and_log_prob(k_init, batch_size)
    log_w = intermediate(x, betas[1]) - log_q0
    ess_base = effective_sample_size(tgt(x) - log_q0, normalize=True)

    def transition(k, x, beta):
        log_pi = lambda xx: intermediate(xx, beta)
        if cfg.transition == "hmc":
            return hmc_transition(
                k, x, log_pi, cfg.n_inner_steps, cfg.step_size, cfg.n_leapfrog
            )
        return metropolis_transition(k, x, log_pi, cfg.n_inner_steps, cfg.step_size)

    def body(carry, inp):
        x, log_w, k = carry
        beta_j, beta_next = inp
        k, k_t = jax.random.split(k)
        x, _ = transition(k_t, x, beta_j)
        log_w = log_w + intermediate(x, beta_next) - intermediate(x, beta_j)
        return (x, log_w, k), None

    # rungs j = 1..n (the last increment to β=1 is included via beta_next)
    pairs = (betas[1:-1], betas[2:])
    (x, log_w, _), _ = jax.lax.scan(body, (x, log_w, k_scan), pairs)

    # non-finite weights are masked out (ais.py:72,84 drops them; we keep
    # shapes static and zero their weight instead)
    finite = jnp.isfinite(log_w)
    log_w = jnp.where(finite, log_w, -jnp.inf)
    ess_ais = effective_sample_size(log_w, normalize=True)
    log_Z = jax.scipy.special.logsumexp(log_w) - jnp.log(batch_size)
    return AISResult(x, log_w, ess_base, ess_ais, log_Z)
