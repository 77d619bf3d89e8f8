"""Auxiliary network components (DEM-heritage utilities the reference carries).

Reference parity (SURVEY §2.4 "DEM leftovers" + wrappers):
- ``SimpleDebugScore`` — ``score_net_simple.py:8-35``: a "network" returning
  the exact denoiser (x0 - xt)/h toward a fixed data mean; used to debug the
  sampler independently of training.
- ``ScalingWrapper`` — ``scaling_wrapper.py:6-29``: fixed input/output affine
  scaling around any backbone.
- ``LambdaWeighter`` — ``lambda_weighter.py:8-25``: loss weights λ(σ); the
  EDM (h+1)/h weight used by the main loss lives in losses.py, this class
  provides the standalone/composable form.
- ``ScoreScaler`` — ``score_scaler.py:8-54``: normalizes scores by a running
  σ-dependent scale.
- ``FlowNet`` — ``score_net.py:49-67``: a denoiser that is just the raw
  backbone output (no EDM preconditioning).
- ``PISNet`` — ``pis_net.py:9-62`` capability: a backbone with an additional
  Langevin-coefficient head, t-conditioned; for path-integral-sampler style
  drifts.
"""

import flax.linen as nn
import jax.numpy as jnp

from pita_tpu.nets.mlp import SinusoidalEmbedding


class SimpleDebugScore:
    """Duck-typed ScoreWrapper returning the exact Gaussian-prior denoiser."""

    def __init__(self, data_mean: jnp.ndarray):
        self.data_mean = data_mean

    def init(self, key, dim, batch=2):
        return {}

    def denoiser(self, params, ht, xt, beta, return_score=False):
        ht = jnp.broadcast_to(jnp.asarray(ht, xt.dtype).reshape(-1), (xt.shape[0],))
        D = jnp.broadcast_to(self.data_mean, xt.shape)
        if return_score:
            return D, (D - xt) / ht[:, None]
        return D

    def score(self, params, ht, xt, beta):
        ht = jnp.broadcast_to(jnp.asarray(ht, xt.dtype).reshape(-1), (xt.shape[0],))
        return (self.denoiser(params, ht, xt, beta) - xt) / ht[:, None]


class ScalingWrapper(nn.Module):
    """Affine input/output scaling around a backbone (scaling_wrapper.py:6-29)."""

    backbone: nn.Module
    input_scale: float = 1.0
    output_scale: float = 1.0

    def __call__(self, t, x, beta):
        out = self.backbone(t, x * self.input_scale, beta)
        return out * self.output_scale


class LambdaWeighter:
    """λ(h) loss weights (lambda_weighter.py:8-25). 'edm': (h+1)/h; 'ones'."""

    def __init__(self, kind: str = "edm", epsilon: float = 1e-3):
        self.kind = kind
        self.epsilon = epsilon

    def __call__(self, ht):
        if self.kind == "edm":
            return (ht + 1.0) / ht
        if self.kind == "ones":
            return jnp.ones_like(ht)
        if self.kind == "basic":
            return 1.0 / (ht + self.epsilon)
        raise ValueError(self.kind)


class ScoreScaler:
    """σ-dependent score normalization (score_scaler.py:8-54)."""

    def __init__(self, noise_schedule, scale_by: str = "sigma"):
        self.noise_schedule = noise_schedule
        self.scale_by = scale_by

    def scale_target_score(self, score, ht):
        return score * jnp.sqrt(ht)[:, None]

    def unscale_score(self, scaled, ht):
        return scaled / jnp.sqrt(ht)[:, None]


class FlowWrapper:
    """Raw-backbone denoiser, no EDM preconditioning (score_net.py FlowNet)."""

    def __init__(self, backbone):
        self.backbone = backbone

    def init(self, key, dim, batch=2):
        t = jnp.zeros((batch,))
        x = jnp.zeros((batch, dim))
        return self.backbone.init(key, t, x, jnp.ones((batch,)))

    def denoiser(self, params, ht, xt, beta, return_score=False):
        ht = jnp.broadcast_to(jnp.asarray(ht, xt.dtype).reshape(-1), (xt.shape[0],))
        D = self.backbone.apply(params, ht, xt, beta)
        if return_score:
            return D, (D - xt) / ht[:, None]
        return D

    def score(self, params, ht, xt, beta):
        ht = jnp.broadcast_to(jnp.asarray(ht, xt.dtype).reshape(-1), (xt.shape[0],))
        return (self.denoiser(params, ht, xt, beta) - xt) / ht[:, None]


class PISNet(nn.Module):
    """Path-integral-sampler net: drift head + t-dependent Langevin-coefficient
    head scaling a provided score (pis_net.py:9-62 capability)."""

    out_dim: int
    hidden_size: int = 64
    emb_size: int = 32

    @nn.compact
    def __call__(self, t, x, score):
        B = x.shape[0]
        t = jnp.broadcast_to(jnp.asarray(t, x.dtype).reshape(-1), (B,))
        t_emb = SinusoidalEmbedding(self.emb_size)(t)
        h = jnp.concatenate([x, t_emb], axis=-1)
        h = nn.gelu(nn.Dense(self.hidden_size)(h))
        h = nn.gelu(nn.Dense(self.hidden_size)(h))
        drift = nn.Dense(self.out_dim, kernel_init=nn.initializers.zeros)(h)
        coeff = nn.Dense(self.out_dim)(nn.gelu(nn.Dense(self.hidden_size)(t_emb)))
        return drift + coeff * score
