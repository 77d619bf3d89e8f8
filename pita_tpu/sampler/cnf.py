"""Continuous normalizing flow for exact-likelihood evaluation.

Reference parity: ``pita/src/models/components/cnf.py:1-168`` — a CNF driven
by the probability-flow ODE of the learned score with exact or Hutchinson
divergence, used to evaluate NLL (torchdiffeq ``odeint`` in the reference).
Rebuilt as a fixed-step RK4 ``lax.scan`` (static shapes, fully fused); the
divergence reuses ``pita_tpu.ops.divergence``.

The probability-flow ODE of the VE diffusion is
    dx/dt = -½ g(t)² s_θ(x, t),
and the log-density change is  d log p/dt = ½ g(t)² div(s_θ).
Integrating t: 0→1 maps data to the (Gaussian) prior; NLL(x0) =
-log N(x1; 0, h(1)) - ∫ divergence.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from pita_tpu.ops.divergence import exact_divergence, hutchinson_divergence


class CNFResult(NamedTuple):
    x1: jnp.ndarray
    delta_logp: jnp.ndarray  # ∫ div term (log p0 = log p1 + delta)
    nll: jnp.ndarray


def cnf_nll(
    key,
    x0: jnp.ndarray,
    score_wrapper,
    params_score,
    noise_schedule,
    beta=1.0,
    num_steps: int = 100,
    exact: bool = True,
    hutchinson_probes: int = 1,
    divergence_chunk_size: Optional[int] = None,
) -> CNFResult:
    """Integrate the probability-flow ODE 0→1 and return per-sample NLL."""
    B, D = x0.shape
    ts = jnp.linspace(0.0, 1.0, num_steps + 1)
    dt = 1.0 / num_steps

    def vector_field(t, x):
        tb = jnp.full((B,), t, x.dtype)
        ht = noise_schedule.h(tb)
        s = score_wrapper.score(params_score, ht, x, beta)
        g2 = noise_schedule.g(tb) ** 2
        return -0.5 * g2[:, None] * s

    def div_term(t, x, k):
        tb = jnp.full((B,), t, x.dtype)
        fn = lambda tt, xx: score_wrapper.score(
            params_score, noise_schedule.h(tt), xx, beta
        )
        if exact:
            div_s = exact_divergence(fn, tb, x, chunk_size=divergence_chunk_size)
        else:
            div_s = hutchinson_divergence(fn, tb, x, k, hutchinson_probes)
        g2 = noise_schedule.g(tb) ** 2
        return 0.5 * g2 * div_s

    def body(carry, inp):
        x, dlogp, k = carry
        t = inp
        k, k_div = jax.random.split(k)
        # RK4 on x; midpoint rule on the divergence integral
        k1 = vector_field(t, x)
        k2 = vector_field(t + dt / 2, x + dt / 2 * k1)
        k3 = vector_field(t + dt / 2, x + dt / 2 * k2)
        k4 = vector_field(t + dt, x + dt * k3)
        x_new = x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        dlogp = dlogp + dt * div_term(t + dt / 2, x + dt / 2 * k1, k_div)
        return (x_new, dlogp, k), None

    (x1, dlogp, _), _ = jax.lax.scan(body, (x0, jnp.zeros((B,), x0.dtype), key), ts[:-1])

    h1 = noise_schedule.h(jnp.asarray(1.0))
    logp1 = -0.5 * jnp.sum(x1**2, axis=-1) / h1 - 0.5 * D * jnp.log(2 * jnp.pi * h1)
    # instantaneous change of variables: d log p/dt = -div(v) with
    # v = -½g²s, so log p0(x0) = log p1(x1) - ∫ ½g² div(s) dt = logp1 - dlogp
    nll = -(logp1 - dlogp)
    return CNFResult(x1=x1, delta_logp=dlogp, nll=nll)
