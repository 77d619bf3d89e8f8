"""MCMC transition operators for AIS.

Reference parity: ``fab/fab/sampling_methods/transition_operators/`` —
``Metropolis`` (random-walk MH with per-step-size ladder adaptation toward a
target acceptance, metropolis.py:10-87) and ``HamiltonianMonteCarlo``
(hmc.py:9-264, leapfrog + per-distribution step-size tuning to 0.65
acceptance). Batched over chains, jitted scans, no host syncs.
"""

import jax
import jax.numpy as jnp


def metropolis_transition(
    key,
    x: jnp.ndarray,
    log_prob_fn,
    n_steps: int,
    step_size: float,
    target_accept: float = 0.65,
    adapt: bool = True,
):
    """Random-walk MH sweeps; returns (x, mean acceptance)."""
    lp = log_prob_fn(x)

    def body(carry, k):
        x, lp, eps = carry
        k_prop, k_acc = jax.random.split(k)
        prop = x + jax.random.normal(k_prop, x.shape, x.dtype) * eps
        lp_prop = log_prob_fn(prop)
        accept = jnp.log(jax.random.uniform(k_acc, lp.shape)) < (lp_prop - lp)
        x = jnp.where(accept[:, None], prop, x)
        lp = jnp.where(accept, lp_prop, lp)
        acc = jnp.mean(accept.astype(jnp.float32))
        if adapt:
            eps = jnp.where(acc > target_accept, eps * 1.05, eps / 1.05)
        return (x, lp, eps), acc

    keys = jax.random.split(key, n_steps)
    (x, _, _), accs = jax.lax.scan(body, (x, lp, jnp.asarray(step_size)), keys)
    return x, jnp.mean(accs)


def hmc_transition(
    key,
    x: jnp.ndarray,
    log_prob_fn,
    n_steps: int,
    step_size: float,
    n_leapfrog: int = 5,
    target_accept: float = 0.65,
    adapt: bool = True,
):
    """HMC sweeps with leapfrog integration; returns (x, mean acceptance)."""
    grad_lp = jax.grad(lambda xx: jnp.sum(log_prob_fn(xx)))
    lp = log_prob_fn(x)

    def leapfrog(x, p, eps):
        p = p + 0.5 * eps * grad_lp(x)

        def lf(i, carry):
            x, p = carry
            x = x + eps * p
            p = p + eps * grad_lp(x)
            return (x, p)

        x, p = jax.lax.fori_loop(0, n_leapfrog, lf, (x, p))
        p = p - 0.5 * eps * grad_lp(x)
        return x, p

    def body(carry, k):
        x, lp, eps = carry
        k_mom, k_acc = jax.random.split(k)
        p = jax.random.normal(k_mom, x.shape, x.dtype)
        ke0 = 0.5 * jnp.sum(p**2, axis=-1)
        x_new, p_new = leapfrog(x, p, eps)
        lp_new = log_prob_fn(x_new)
        ke1 = 0.5 * jnp.sum(p_new**2, axis=-1)
        log_ratio = (lp_new - lp) + (ke0 - ke1)
        log_ratio = jnp.where(jnp.isfinite(log_ratio), log_ratio, -jnp.inf)
        accept = jnp.log(jax.random.uniform(k_acc, lp.shape)) < log_ratio
        x = jnp.where(accept[:, None], x_new, x)
        lp = jnp.where(accept, lp_new, lp)
        acc = jnp.mean(accept.astype(jnp.float32))
        if adapt:
            eps = jnp.where(acc > target_accept, eps * 1.05, eps / 1.05)
        return (x, lp, eps), acc

    keys = jax.random.split(key, n_steps)
    (x, _, _), accs = jax.lax.scan(body, (x, lp, jnp.asarray(step_size)), keys)
    return x, jnp.mean(accs)
