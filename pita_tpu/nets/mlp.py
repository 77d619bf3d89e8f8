"""MLP backbone with sinusoidal input/time/temperature embeddings.

Reference parity: ``pita/src/models/components/mlp.py`` (``MyMLP`` :199-267 and
``MyMLPTemperature`` :453-524) — per-coordinate sinusoidal positional
embeddings (scale 25), sinusoidal time embedding, residual GELU blocks with
additive time conditioning, and an optional temperature (beta) embedding.

The backbone convention matches the whole framework:
``forward(t, x, beta) -> (B, out_dim)`` with t = c_noise from the EDM
preconditioner (score_net.py:29).
"""

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class SinusoidalEmbedding(nn.Module):
    """Fixed sinusoidal embedding of a scalar (mlp.py PositionalEmbedding)."""

    size: int
    scale: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x * self.scale
        half = self.size // 2
        freqs = jnp.exp(jnp.arange(half) * -(np.log(10000.0) / (half - 1)))
        args = x[..., None] * freqs
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class ResidualBlock(nn.Module):
    """Linear + GELU with additive time-embedding conditioning (mlp.py Block)."""

    hidden_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, t_emb: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.hidden_size)(x)
        h = nn.gelu(h)
        return x + h + t_emb


class MLPBackbone(nn.Module):
    """Residual MLP over flattened coordinates, conditioned on (t, beta)."""

    out_dim: int
    hidden_size: int = 128
    hidden_layers: int = 3
    emb_size: int = 128
    input_scale: float = 25.0
    condition_on_temperature: bool = True

    @nn.compact
    def __call__(self, t: jnp.ndarray, x: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
        B, D = x.shape
        coord_emb = SinusoidalEmbedding(self.emb_size, scale=self.input_scale)(x)
        coord_emb = coord_emb.reshape(B, -1)
        t_emb = SinusoidalEmbedding(self.emb_size)(t)
        feats = [coord_emb, t_emb]
        if self.condition_on_temperature:
            beta = jnp.broadcast_to(jnp.asarray(beta, x.dtype), (B,))
            feats.append(SinusoidalEmbedding(self.emb_size)(beta))
        h = jnp.concatenate(feats, axis=-1)
        h = nn.gelu(nn.Dense(self.hidden_size)(h))
        t_cond = nn.Dense(self.hidden_size)(t_emb)
        for _ in range(self.hidden_layers):
            h = ResidualBlock(self.hidden_size)(h, t_cond)
        return nn.Dense(self.out_dim, kernel_init=nn.initializers.zeros)(h)
