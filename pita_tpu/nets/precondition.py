"""EDM preconditioning wrappers: ScoreWrapper and EnergyWrapper.

Reference parity:
- ``ScoreWrapper`` == ``pita/src/models/components/score_net.py:7-47``:
  ``c_s = 1/(1+h)``, ``c_in = (1+h)^{-1/2}``, ``c_out = sqrt(h)·c_in``,
  ``c_noise = (1/8)·ln h``; denoiser ``D = c_s·x + c_out·F(c_noise, c_in·x, β)``
  and score ``(D - x)/h``; optional beta-preconditioning.
- ``EnergyWrapper`` == ``pita/src/models/components/energy_net.py:8-83``:
  scalar energy from the same *vector* backbone via the inner-product trick
  ``U_θ = <F(c_noise, c_in·x, β), c_in·x>`` and
  ``E_θ = (1-c_s)/(2h)·||x||² − c_out/(c_in·h)·U_θ``; score = ∇_x E via
  ``jax.grad``; joint (denoiser, dU/dh, U) via one grad over (x, h); optional
  pinning to the clamped true energy near t=0 by (1-t)³ (energy_net.py:43-48).

Design: wrappers are thin, stateless objects over a flax backbone; every
method takes ``params`` explicitly and is a pure function — safe under
``jit``/``grad``/``vmap``/``scan`` and differentiable to any order (the
reference could not ``torch.compile`` its double-backward path,
energytemp_module.py:118-122; JAX composes it for free).
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp


def _coeffs(ht: jnp.ndarray):
    c_s = 1.0 / (1.0 + ht)
    c_in = (1.0 + ht) ** -0.5
    c_out = ht**0.5 * c_in
    c_noise = 0.125 * jnp.log(ht)
    return c_s, c_in, c_out, c_noise


def _bcast(v, B, dtype):
    return jnp.broadcast_to(jnp.asarray(v, dtype).reshape(-1), (B,))


def _apply_backbone(backbone, params, t, x, beta):
    """Backbone forward; EGNN backbones route through the factorized-geometry
    pure function (nets/egnn_fast.egnn_apply — identical math, tested, with
    cheaper reverse-mode structure: no (B, N, N, 3) cotangent tensors)."""
    from pita_tpu.nets.egnn_fast import egnn_apply, supports_fast_divergence

    if supports_fast_divergence(backbone):
        return egnn_apply(params, backbone, t, x, beta)
    return backbone.apply(params, t, x, beta)


class ScoreWrapper:
    """EDM-preconditioned denoiser/score over a vector backbone."""

    def __init__(self, backbone, precondition_beta: bool = False):
        self.backbone = backbone
        self.precondition_beta = precondition_beta

    def init(self, key, dim: int, batch: int = 2):
        t = jnp.zeros((batch,))
        x = jnp.zeros((batch, dim))
        beta = jnp.ones((batch,))
        return self.backbone.init(key, t, x, beta)

    def denoiser(self, params, ht, xt, beta, return_score: bool = False):
        B = xt.shape[0]
        ht = _bcast(ht, B, xt.dtype)
        beta = _bcast(beta, B, xt.dtype)
        c_s, c_in, c_out, c_noise = _coeffs(ht)
        F = _apply_backbone(self.backbone, params, c_noise, c_in[:, None] * xt, beta)
        D = c_s[:, None] * xt + c_out[:, None] * F
        score = (D - xt) / ht[:, None]
        if self.precondition_beta:
            D = D * beta[:, None] + (1 - beta[:, None]) * xt
            score = score * beta[:, None]
        if return_score:
            return D, score
        return D

    def score(self, params, ht, xt, beta):
        """(D(x) - x) / h — the score of the learned density (score_net.py:13-19)."""
        B = xt.shape[0]
        ht = _bcast(ht, B, xt.dtype)
        D = self.denoiser(params, ht, xt, beta)
        return (D - xt) / ht[:, None]


class EnergyWrapper:
    """Scalar-energy head over a vector backbone via the <F(x), x> trick."""

    def __init__(self, backbone, precondition_beta: bool = False):
        self.backbone = backbone
        self.precondition_beta = precondition_beta

    def init(self, key, dim: int, batch: int = 2):
        t = jnp.zeros((batch,))
        x = jnp.zeros((batch, dim))
        beta = jnp.ones((batch,))
        return self.backbone.init(key, t, x, beta)

    def energy(
        self,
        params,
        ht,
        xt,
        beta,
        pin: bool = False,
        t: Optional[jnp.ndarray] = None,
        energy_function: Any = None,
        backbone_fwd: Any = None,
    ):
        """E_θ(h, x, β): (B,) (energy_net.py:14-49).

        ``backbone_fwd`` optionally replaces the backbone application (e.g.
        the fused Pallas forward+backward on the sampler's drift path)."""
        B = xt.shape[0]
        ht = _bcast(ht, B, xt.dtype)
        beta = _bcast(beta, B, xt.dtype)
        c_s, c_in, c_out, c_noise = _coeffs(ht)
        x_in = c_in[:, None] * xt
        if backbone_fwd is not None:
            F = backbone_fwd(params, c_noise, x_in, beta)
        else:
            F = _apply_backbone(self.backbone, params, c_noise, x_in, beta)
        U_theta = jnp.sum(F * x_in, axis=-1)
        E = (1 - c_s) / (2 * ht) * jnp.sum(xt**2, axis=-1) - c_out / (c_in * ht) * U_theta
        if self.precondition_beta:
            E = E * beta
        if pin:
            assert t is not None and energy_function is not None
            U0 = jnp.clip(-energy_function(xt), -1e3, 1e3)
            t = _bcast(t, B, xt.dtype)
            w = (1 - t) ** 3
            E = w * U0 + (1 - w) * E
        return E

    def grad_x(self, params, ht, xt, beta, **pin_kw):
        """∇_x E_θ (energy_net.py:51-62)."""
        g = jax.grad(lambda x: jnp.sum(self.energy(params, ht, x, beta, **pin_kw)))
        return g(xt)

    def denoiser(self, params, ht, xt, beta):
        """x - h·∇_x E (energy_net.py:64-66)."""
        B = xt.shape[0]
        ht = _bcast(ht, B, xt.dtype)
        return xt - ht[:, None] * self.grad_x(params, ht, xt, beta)

    def denoiser_and_energy(self, params, ht, xt, beta):
        """(denoiser, dU/dh, U) via one joint grad over (x, h) (energy_net.py:68-79)."""
        B = xt.shape[0]
        ht = _bcast(ht, B, xt.dtype)

        def u_sum(x, h):
            return jnp.sum(self.energy(params, h, x, beta))

        U = self.energy(params, ht, xt, beta)
        nabla_U, dU_dh = jax.grad(u_sum, argnums=(0, 1))(xt, ht)
        return xt - ht[:, None] * nabla_U, dU_dh, U
