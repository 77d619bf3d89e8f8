"""RealNVP normalizing flow — the trainable base distribution for FAB.

Reference parity: fab's ``TrainableDistribution`` wraps a normflows RealNVP
(``fab/fab/trainable_distributions/``, used by ``FABModel``,
fab/fab/core.py:18-35). Rebuilt as a flax module with explicit params:
affine coupling layers with alternating binary masks, tanh-bounded log-scales,
and a standard-normal base — fully jittable forward/inverse with log-dets.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


class _Conditioner(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        h = nn.silu(nn.Dense(self.hidden)(x))
        h = nn.silu(nn.Dense(self.hidden)(h))
        # zero-init final layer: the flow starts at the identity map
        return nn.Dense(self.out, kernel_init=nn.initializers.zeros)(h)


class RealNVP(nn.Module):
    dim: int
    n_coupling: int = 8
    hidden: int = 64
    log_scale_cap: float = 3.0  # tanh bound on log-scales (stability)

    def setup(self):
        # setup-pinned submodules: forward and inverse iterate the same list
        # (compact-style creation would bind params by *call order*, which
        # reverses in the inverse pass)
        self.conditioners = [
            _Conditioner(self.hidden, 2 * self.dim, name=f"coupling_{i}")
            for i in range(self.n_coupling)
        ]

    def _mask(self, i):
        return (jnp.arange(self.dim) % 2 == i % 2).astype(jnp.float32)

    def __call__(self, z):
        return self.forward(z)

    def forward(self, z):
        """z → (x, logdet)."""
        logdet = jnp.zeros(z.shape[:-1])
        for i, net in enumerate(self.conditioners):
            m = self._mask(i)
            st = net(z * m)
            s, t = jnp.split(st, 2, axis=-1)
            s = jnp.tanh(s / self.log_scale_cap) * self.log_scale_cap
            z = m * z + (1 - m) * (z * jnp.exp(s) + t)
            logdet = logdet + jnp.sum((1 - m) * s, axis=-1)
        return z, logdet

    def inverse(self, x):
        """x → (z, logdet of the inverse map)."""
        logdet = jnp.zeros(x.shape[:-1])
        for i in reversed(range(self.n_coupling)):
            m = self._mask(i)
            st = self.conditioners[i](x * m)
            s, t = jnp.split(st, 2, axis=-1)
            s = jnp.tanh(s / self.log_scale_cap) * self.log_scale_cap
            x = m * x + (1 - m) * ((x - t) * jnp.exp(-s))
            logdet = logdet - jnp.sum((1 - m) * s, axis=-1)
        return x, logdet


class FlowDistribution:
    """Params-explicit sampling/log-prob API over a RealNVP module."""

    def __init__(self, dim: int, n_coupling: int = 8, hidden: int = 64,
                 base_scale: float = 1.0):
        self.dim = dim
        self.module = RealNVP(dim=dim, n_coupling=n_coupling, hidden=hidden)
        self.base_scale = base_scale

    def init(self, key):
        return self.module.init(key, jnp.zeros((1, self.dim)))

    def _base_log_prob(self, z):
        s = self.base_scale
        return -0.5 * jnp.sum((z / s) ** 2, axis=-1) - self.dim * (
            0.5 * jnp.log(2 * jnp.pi) + jnp.log(s)
        )

    def sample_and_log_prob(self, params, key, num_samples: int):
        z = jax.random.normal(key, (num_samples, self.dim)) * self.base_scale
        x, logdet = self.module.apply(params, z)
        return x, self._base_log_prob(z) - logdet

    def sample(self, params, key, num_samples: int):
        return self.sample_and_log_prob(params, key, num_samples)[0]

    def log_prob(self, params, x):
        z, logdet = self.module.apply(params, x, method="inverse")
        return self._base_log_prob(z) + logdet
