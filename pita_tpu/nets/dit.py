"""DiT3D — non-equivariant diffusion transformer over particles-as-tokens.

Reference parity: ``pita/src/models/components/dit.py:569-646`` (DIT3D):
linear "vocab" embedding of 3D coordinates, sinusoidal ``TimestepEmbedder``
for t *and* β summed into the adaLN conditioning vector (:596-597,634-639),
rotary position embeddings on q/k, ``DDiTBlock`` = adaLN-modulated attention +
tanh-GELU MLP with gate/shift/scale (all zero-init, :316-322), zero-init final
layer (:355-371), bf16 autocast in the block stack (:641).

TPU-first notes: sequence length = n_particles ≤ 55 — a single MXU tile — so
attention is a plain fused softmax-attention (no flash/varlen machinery, which
the reference carries but disables, :346-360); the whole block stack runs in
bf16 with f32 layernorms, matching the reference's autocast boundary.
"""

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class TimestepEmbedder(nn.Module):
    """Sinusoidal frequency embedding → 2-layer SiLU MLP (dit.py TimestepEmbedder)."""

    cond_dim: int
    freq_dim: int = 256

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half = self.freq_dim // 2
        freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / half)
        args = t[:, None].astype(jnp.float32) * freqs[None]
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        h = nn.silu(nn.Dense(self.cond_dim)(emb))
        return nn.Dense(self.cond_dim)(h)


def _rotary(q: jnp.ndarray, base: float = 10000.0) -> jnp.ndarray:
    """Apply rotary position embeddings over the token axis.

    q: (B, S, H, Dh). Matches torchtune RotaryPositionalEmbeddings (dit.py:599-601).
    """
    B, S, H, Dh = q.shape
    half = Dh // 2
    inv_freq = 1.0 / (base ** (jnp.arange(0, half) / half))
    pos = jnp.arange(S)
    freqs = pos[:, None] * inv_freq[None, :]  # (S, half)
    cos = jnp.cos(freqs)[None, :, None, :]
    sin = jnp.sin(freqs)[None, :, None, :]
    q1, q2 = q[..., 0::2], q[..., 1::2]
    out1 = q1 * cos - q2 * sin
    out2 = q2 * cos + q1 * sin
    return jnp.stack([out1, out2], axis=-1).reshape(B, S, H, Dh)


class DDiTBlock(nn.Module):
    """adaLN-modulated attention + MLP block (dit.py:246-336)."""

    dim: int
    n_heads: int
    cond_dim: int
    mlp_ratio: int = 4
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        cd = self.compute_dtype
        mods = nn.Dense(
            6 * self.dim,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(c)[:, None]
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(
            mods, 6, axis=-1
        )

        def modulate(h, shift, scale):
            return h * (1 + scale) + shift

        # attention (f32 layernorm, bf16 matmuls — autocast parity, dit.py:291-296)
        h = nn.LayerNorm(use_bias=False)(x.astype(jnp.float32))
        h = modulate(h, shift_msa, scale_msa).astype(cd)
        B, S, _ = h.shape
        qkv = nn.Dense(3 * self.dim, use_bias=False, dtype=cd)(h)
        qkv = qkv.reshape(B, S, 3, self.n_heads, self.dim // self.n_heads)
        q = _rotary(qkv[:, :, 0].astype(jnp.float32)).astype(cd)
        k = _rotary(qkv[:, :, 1].astype(jnp.float32)).astype(cd)
        v = qkv[:, :, 2]
        scale = 1.0 / math.sqrt(self.dim // self.n_heads)
        attn = jnp.einsum("bshd,bthd->bhst", q, k) * scale
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(cd)
        o = jnp.einsum("bhst,bthd->bshd", attn, v).reshape(B, S, self.dim)
        o = nn.Dense(self.dim, use_bias=False, dtype=cd)(o)
        x = x + gate_msa * o.astype(x.dtype)

        # MLP
        h = nn.LayerNorm(use_bias=False)(x.astype(jnp.float32))
        h = modulate(h, shift_mlp, scale_mlp).astype(cd)
        h = nn.Dense(self.mlp_ratio * self.dim, dtype=cd)(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(self.dim, dtype=cd)(h)
        return x + gate_mlp * h.astype(x.dtype)


class DiT3DBackbone(nn.Module):
    """forward(t, x, beta) -> (B, n_particles*3) (dit.py DIT3D.forward, :627-646)."""

    n_particles: int
    n_spatial_dim: int = 3
    hidden_size: int = 128
    cond_dim: int = 128
    n_heads: int = 8
    n_blocks: int = 6
    condition_on_temperature: bool = True
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, t: jnp.ndarray, x: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
        B = x.shape[0]
        S, V = self.n_particles, self.n_spatial_dim
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32).reshape(-1), (B,))
        tok = x.reshape(B, S, V)
        h = nn.Dense(self.hidden_size)(tok)
        c = TimestepEmbedder(self.cond_dim, name="sigma_map")(t)
        if self.condition_on_temperature:
            beta = jnp.broadcast_to(jnp.asarray(beta, jnp.float32).reshape(-1), (B,))
            c = c + TimestepEmbedder(self.cond_dim, name="sigma_map_temp")(beta)
        c = nn.silu(c)
        for _ in range(self.n_blocks):
            h = DDiTBlock(
                self.hidden_size, self.n_heads, self.cond_dim,
                compute_dtype=self.compute_dtype,
            )(h, c)
        # zero-init final layer with 2-way adaLN (dit.py:355-371)
        mods = nn.Dense(
            2 * self.hidden_size,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(c)[:, None]
        shift, scale = jnp.split(mods, 2, axis=-1)
        hf = nn.LayerNorm(use_bias=False)(h.astype(jnp.float32))
        hf = hf * (1 + scale) + shift
        out = nn.Dense(
            V, kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros
        )(hf)
        return out.reshape(B, S * V)
