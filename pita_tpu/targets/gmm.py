"""GMM-40: 40-mode 2D Gaussian mixture target.

Reference parity: ``pita/src/energies/gmm_energy.py`` wrapping
``fab/fab/target_distributions/gmm.py``. Mode locations are the exact seed-0
draw of the fab GMM (``(rand(40,2)-0.5)*80``), stored as an asset so no torch
dependency is needed at runtime; per-dim scale = softplus(log_var_scaling).
Temperature enters as ``log_prob / T`` (gmm_energy.py:87-90).

Also provides analytic tempered products: ``gmm_power(target, beta)`` builds
the exact GMM proportional to p(x)^beta for integer beta by repeated pairwise
Gaussian products (gmm_energy.py:257-358) — an exact reference density for
validating the annealed sampler.
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from pita_tpu.targets.base import Target

_ASSET = os.path.join(os.path.dirname(__file__), "..", "assets", "gmm40_locs.npy")


def _softplus(x):
    return math.log1p(math.exp(x))


def _mixture_log_prob(x, locs, scales, log_weights):
    """Diagonal-Gaussian mixture log-density. x: (..., D)."""
    x = x[..., None, :]  # (..., 1, D)
    d = x.shape[-1]
    z = (x - locs) / scales  # (..., K, D)
    comp_lp = -0.5 * jnp.sum(z**2, axis=-1) - jnp.sum(jnp.log(scales), axis=-1)
    comp_lp = comp_lp - 0.5 * d * math.log(2 * math.pi)
    logw = jax.nn.log_softmax(log_weights)
    return jax.scipy.special.logsumexp(comp_lp + logw, axis=-1)


class GMM40(Target):
    """40-mode GMM in 2D, modes ~ U(-40,40)^2 (fab seed 0), sigma≈1.3133."""

    is_molecule = False
    name = "gmm"

    def __init__(
        self,
        dimensionality: int = 2,
        n_mixes: int = 40,
        loc_scaling: float = 40.0,
        log_var_scaling: float = 1.0,
        temperature: float = 1.0,
        locs: np.ndarray = None,
        scales: np.ndarray = None,
        log_weights: np.ndarray = None,
        train_set_size: int = 100000,
        val_set_size: int = 10000,
        test_set_size: int = 10000,
        data_seed: int = 0,
        normalized: bool = False,
        data_normalization_factor: float = 50.0,
    ):
        self.dim = dimensionality
        self.n_spatial_dim = dimensionality
        self.temperature = float(temperature)
        if locs is None:
            locs = np.load(os.path.abspath(_ASSET))[:n_mixes]
            assert locs.shape == (n_mixes, dimensionality), "asset only covers 40x2"
        if scales is None:
            scales = np.full((n_mixes, dimensionality), _softplus(log_var_scaling))
        if normalized:
            # train in [-1,1]-ish coordinates (the reference normalizes GMM
            # data by /50, gmm_energy.py data_normalization_factor)
            locs = np.asarray(locs) / data_normalization_factor
            scales = np.asarray(scales) / data_normalization_factor
        self.normalized = normalized
        self.locs = jnp.asarray(locs, dtype=jnp.float32)
        self.scales = jnp.asarray(scales, dtype=jnp.float32)
        if log_weights is None:
            log_weights = np.zeros((n_mixes,))
        self.log_weights = jnp.asarray(log_weights, dtype=jnp.float32)
        self.n_mixes = n_mixes
        self._set_sizes = dict(train=train_set_size, val=val_set_size, test=test_set_size)
        self._data_seed = data_seed

    def log_prob(self, x):
        return _mixture_log_prob(x, self.locs, self.scales, self.log_weights) / self.temperature

    def sample(self, key, num_samples: int):
        k1, k2 = jax.random.split(key)
        comp = jax.random.categorical(k1, jnp.broadcast_to(
            jax.nn.log_softmax(self.log_weights), (num_samples, self.n_mixes)))
        eps = jax.random.normal(k2, (num_samples, self.dim))
        return self.locs[comp] + self.scales[comp] * eps

    def _make_set(self, which):
        seeds = dict(train=0, val=1, test=2)
        key = jax.random.fold_in(jax.random.PRNGKey(self._data_seed), seeds[which])
        return np.asarray(self.sample(key, self._set_sizes[which]))

    def setup_train_set(self):
        return self._make_set("train")

    def setup_val_set(self):
        return self._make_set("val")

    def setup_test_set(self):
        return self._make_set("test")


def noised_gmm_log_prob(gmm: GMM40, ht, x):
    """log density of the VE-noised GMM: convolving a diagonal-Gaussian
    mixture with N(0, h I) just widens each component to sqrt(s² + h).

    ht: (B,) per-sample noise variances; x: (B, D). Exact at every t — the
    analytic oracle used to validate the annealed FK sampler end-to-end
    without training.
    """
    ht = jnp.asarray(ht).reshape(-1, 1, 1)
    scales = jnp.sqrt(gmm.scales[None] ** 2 + ht)  # (B, K, D)
    xk = x[:, None, :]
    d = x.shape[-1]
    z = (xk - gmm.locs[None]) / scales
    comp_lp = (
        -0.5 * jnp.sum(z**2, axis=-1)
        - jnp.sum(jnp.log(scales), axis=-1)
        - 0.5 * d * math.log(2 * math.pi)
    )
    logw = jax.nn.log_softmax(gmm.log_weights)
    return jax.scipy.special.logsumexp(comp_lp + logw[None], axis=-1)


class GMMScoreOracle:
    """Duck-typed ScoreWrapper with the exact noised-GMM score."""

    def __init__(self, gmm: GMM40):
        self.gmm = gmm

    def score(self, params, ht, xt, beta):
        ht = jnp.broadcast_to(jnp.asarray(ht, xt.dtype).reshape(-1), (xt.shape[0],))
        return jax.grad(lambda x: jnp.sum(noised_gmm_log_prob(self.gmm, ht, x)))(xt)

    def denoiser(self, params, ht, xt, beta):
        ht = jnp.broadcast_to(jnp.asarray(ht, xt.dtype).reshape(-1), (xt.shape[0],))
        return xt + ht[:, None] * self.score(params, ht, xt, beta)


class GMMEnergyOracle:
    """Duck-typed EnergyWrapper with the exact noised-GMM energy."""

    def __init__(self, gmm: GMM40):
        self.gmm = gmm

    def energy(self, params, ht, xt, beta, **kw):
        ht = jnp.broadcast_to(jnp.asarray(ht, xt.dtype).reshape(-1), (xt.shape[0],))
        return -noised_gmm_log_prob(self.gmm, ht, xt)


def gmm_product(a: GMM40, b: GMM40, prune: float = 1e-4) -> GMM40:
    """Exact product density of two GMMs (gmm_energy.py:279-338).

    Vectorized over all K_a × K_b component pairs (host-side numpy; runs once
    per ladder rung, not in the compute path).
    """
    mu1 = np.asarray(a.locs)[:, None, :]  # (Ka,1,D)
    mu2 = np.asarray(b.locs)[None, :, :]  # (1,Kb,D)
    v1 = np.asarray(a.scales)[:, None, :] ** 2
    v2 = np.asarray(b.scales)[None, :, :] ** 2
    logw = np.asarray(a.log_weights)[:, None] + np.asarray(b.log_weights)[None, :]

    denom = v1 + v2
    mu = (mu1 * v2 + mu2 * v1) / denom
    std = np.sqrt(v1 * v2 / denom)
    diff = mu1 - mu2
    logw = (
        logw
        - 0.5 * np.log(2 * math.pi * np.prod(denom, axis=-1))
        + np.sum(-(diff**2) / (2 * denom), axis=-1)
    )

    D = mu.shape[-1]
    mu, std, logw = mu.reshape(-1, D), std.reshape(-1, D), logw.reshape(-1)
    w = np.exp(logw - logw.max())
    mask = w / w.sum() > prune
    return GMM40(
        dimensionality=a.dim,
        n_mixes=int(mask.sum()),
        locs=mu[mask],
        scales=std[mask],
        log_weights=logw[mask],
    )


def gmm_power(base: GMM40, beta: int) -> GMM40:
    """Exact GMM ∝ p(x)^beta for integer beta (gmm_energy.py:340-358)."""
    assert int(beta) == beta and beta >= 1
    out = base
    for _ in range(int(beta) - 1):
        out = gmm_product(base, out)
    return out
