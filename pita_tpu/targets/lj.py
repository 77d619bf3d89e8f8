"""Lennard-Jones cluster targets (LJ13, LJ55).

Reference parity: ``pita/src/energies/lennardjones_energy.py``:
- pair energy ``eps*((rm/r)^12 - 2*(rm/r)^6)`` summed over all *ordered* pairs
  (the reference uses bgflow's ``distance_vectors`` which enumerates i≠j, so
  every unordered pair is counted twice — we match, lennardjones_energy.py:121-143),
- harmonic center-of-mass oscillator ``0.5 * ||x - x̄||²`` added,
- optional cubic-spline smoothing of the pair energy below ``r = range_min``
  (fit on [range_min, range_max], evaluated by interval lookup; below
  range_min the first interval's cubic extrapolates — lennardjones_energy.py:42-55),
- temperature enters as ``log_prob = -E / T`` (:153-155), force via autograd.

TPU-first design: the energy is a dense ``(B, N, N)`` computation — masked
diagonal, no gather/scatter — which XLA fuses into a handful of VPU ops, and
its gradient (the force) fuses with it via ``jax.value_and_grad`` inside the
sampler scan. A Pallas tiled kernel for very large N lives in
``pita_tpu.ops.pallas.lj``; at N ≤ 55 the dense XLA path is already
bandwidth-optimal.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pita_tpu.targets.base import Target


def lj_pair_energy(r, eps=1.0, rm=1.0):
    """eps * ((rm/r)^12 - 2 (rm/r)^6) (lennardjones_energy.py:34-39)."""
    x6 = (rm / r) ** 6
    return eps * (x6 * x6 - 2 * x6)


def _fit_smoothing_spline(eps, rm, range_min, range_max, interpolation=1000):
    """Cubic-spline coefficients for the pair energy on [range_min, range_max].

    Matches the reference's scipy CubicSpline fit (lennardjones_energy.py:116-119).
    Returns (knots, coeffs) as numpy arrays; evaluation is pure jnp.
    """
    from scipy.interpolate import CubicSpline

    xs = np.linspace(range_min, range_max, interpolation)
    es = eps * ((rm / xs) ** 12 - 2 * (rm / xs) ** 6)
    c = CubicSpline(xs, es).c  # (4, K-1)
    return xs.astype(np.float32), c.astype(np.float32)


def _eval_spline(r, knots, coeffs):
    """Evaluate the smoothing cubic below range_min (lennardjones_energy.py:42-55).

    The reference replaces the pair energy by the spline only where
    ``r < range_min`` — there the bucketized interval always clamps to the
    *first* spline segment, so the smoothing is exactly one cubic
    ``c0·dx³ + c1·dx² + c2·dx + c3`` with ``dx = r - range_min``: four scalar
    coefficients, no table gather (per-element gathers on large 3D tensors
    inside grad/scan fault the TPU runtime).
    """
    dx = r - knots[0]
    return coeffs[0, 0] * dx**3 + coeffs[1, 0] * dx**2 + coeffs[2, 0] * dx + coeffs[3, 0]


class LennardJones(Target):
    """LJ cluster of ``n_particles`` in 3D with CoM oscillator."""

    is_molecule = True
    n_spatial_dim = 3

    def __init__(
        self,
        n_particles: int,
        eps: float = 1.0,
        rm: float = 1.0,
        oscillator: bool = True,
        oscillator_scale: float = 1.0,
        energy_factor: float = 1.0,
        smooth: bool = False,
        range_min: float = 0.65,
        range_max: float = 2.0,
        temperature: float = 1.0,
        data_dir: str = None,
        use_pallas: bool = False,
    ):
        self.n_particles = n_particles
        self.dim = n_particles * 3
        self.eps = eps
        self.rm = rm
        self.oscillator = oscillator
        self.oscillator_scale = oscillator_scale
        self.energy_factor = energy_factor
        self.smooth = smooth
        self.range_min = range_min
        self.temperature = float(temperature)
        self.name = f"lj{n_particles}"
        self.data_dir = data_dir
        self.use_pallas = use_pallas
        if smooth:
            knots, coeffs = _fit_smoothing_spline(eps, rm, range_min, range_max)
            self._knots = jnp.asarray(knots)
            self._coeffs = jnp.asarray(coeffs)

    def energy(self, x: jnp.ndarray) -> jnp.ndarray:
        """Untempered energy E(x); x: (..., dim)."""
        shape = x.shape[:-1]
        xr = x.reshape(*shape, self.n_particles, 3)
        diff = xr[..., :, None, :] - xr[..., None, :, :]
        d2 = jnp.sum(diff**2, axis=-1)
        eye = jnp.eye(self.n_particles, dtype=bool)
        # keep the diagonal finite so autograd stays NaN-free; mask it out below
        r = jnp.sqrt(jnp.where(eye, 1.0, d2))
        e_pair = lj_pair_energy(r, self.eps, self.rm)
        if self.smooth:
            e_pair = jnp.where(r < self.range_min, _eval_spline(r, self._knots, self._coeffs), e_pair)
        e = jnp.sum(jnp.where(eye, 0.0, e_pair), axis=(-2, -1)) * self.energy_factor
        if self.oscillator:
            centered = xr - jnp.mean(xr, axis=-2, keepdims=True)
            e = e + 0.5 * self.oscillator_scale * jnp.sum(centered**2, axis=(-2, -1))
        return e

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        return -self.energy(x) / self.temperature

    def log_prob_and_force(self, x: jnp.ndarray):
        if self.use_pallas and x.ndim == 2:
            from pita_tpu.ops.pallas.lj import lj_log_prob_and_force

            spline = None
            if self.smooth:
                c = np.asarray(self._coeffs)
                spline = (
                    float(c[0, 0]), float(c[1, 0]), float(c[2, 0]),
                    float(c[3, 0]), float(np.asarray(self._knots)[0]),
                )
            return lj_log_prob_and_force(
                x, self.n_particles, eps=self.eps, rm=self.rm,
                oscillator_scale=self.oscillator_scale if self.oscillator else 0.0,
                energy_factor=self.energy_factor, temperature=self.temperature,
                block_b=64, spline=spline,
            )
        return super().log_prob_and_force(x)

    # ---- datasets: load from data_dir (reference .npy convention) or MCMC-generate ----

    def _dataset_path(self, which):
        import os

        if self.data_dir is None:
            return None
        # reference convention: {name}{N}_temp_{T} (base_molecule_energy_function.py:54-68)
        fname = f"LJ{self.n_particles}_temp_{self.temperature:.1f}_{which}.npy"
        return os.path.join(self.data_dir, fname)

    def _load_or_generate(self, which, num_samples=10000):
        import os

        path = self._dataset_path(which)
        if path is not None and os.path.exists(path):
            return np.load(path).reshape(-1, self.dim)
        from pita_tpu.baselines.mcmc import generate_lj_dataset

        seeds = dict(train=101, val=102, test=103)
        data = generate_lj_dataset(self, num_samples=num_samples, seed=seeds[which])
        if path is not None:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            np.save(path, data)
        return data

    def setup_train_set(self):
        return self._load_or_generate("train")

    def setup_val_set(self):
        return self._load_or_generate("val", num_samples=2048)

    def setup_test_set(self):
        return self._load_or_generate("test", num_samples=2048)


def LJ13(**kw) -> LennardJones:
    return LennardJones(n_particles=13, **kw)


def LJ55(**kw) -> LennardJones:
    return LennardJones(n_particles=55, **kw)
