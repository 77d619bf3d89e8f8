"""Divergence / Laplacian estimators for the Feynman–Kac weight drift.

Reference parity: ``pita/src/models/components/utils.py:24-96`` — exact
divergence via vmapped Jacobian trace (torch.compile'd in the reference),
exact Laplacian via Hessian trace, Hutchinson estimators with Rademacher
probes. Problem dimensions here are ≤ 165 (LJ55), so the exact forward-mode
trace is affordable: ``jacfwd`` turns one sample's divergence into a ``dim``-
wide batched JVP, and ``vmap`` over the chain batch keeps the MXU busy.
"""

import jax
import jax.numpy as jnp


def exact_divergence(f, t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """tr(∂f/∂x) per sample; f maps (t:(B,), x:(B,D)) -> (B,D).

    Equivalent of ``compiled_divergence_fn`` (utils.py:30-40), forward-mode.
    """

    def single(ti, xi):
        jac = jax.jacfwd(lambda xx: f(ti[None], xx[None])[0])(xi)
        return jnp.trace(jac)

    return jax.vmap(single)(t, x)


def exact_laplacian(u, t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """tr(∂²U/∂x²) per sample; u maps (t:(B,), x:(B,D)) -> (B,).

    Equivalent of ``compute_laplacian_exact`` (utils.py:68-77), via
    forward-over-reverse Hessian diagonal trace.
    """

    def single(ti, xi):
        grad_u = jax.grad(lambda xx: u(ti[None], xx[None])[0])
        hess = jax.jacfwd(grad_u)(xi)
        return jnp.trace(hess)

    return jax.vmap(single)(t, x)


def hutchinson_divergence(f, t: jnp.ndarray, x: jnp.ndarray, key, num_probes: int = 1):
    """Rademacher-probe divergence estimate (utils.py:80-96)."""

    def one_probe(k):
        eps = jax.random.rademacher(k, x.shape, dtype=x.dtype)
        _, jvp = jax.jvp(lambda xx: f(t, xx), (x,), (eps,))
        return jnp.sum(jvp * eps, axis=-1)

    keys = jax.random.split(key, num_probes)
    return jnp.mean(jax.vmap(one_probe)(keys), axis=0)
