"""Langevin molecular dynamics on the JAX force field.

Reference parity: ``pita/src/generate_md.py`` — OpenMM LangevinMiddleIntegrator
MD for peptides (amber + OBC implicit solvent) producing checkpointed ``.npz``
trajectory dumps for training data. Rebuilt as a jitted BAOAB scan on the
self-contained force field: thousands of steps per device dispatch, optional
parallel replicas (the reference runs one trajectory per process).

Units: positions nm, time ps, masses amu; kT in kcal/mol converted into the
amu·nm²/ps² energy scale.
"""

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

# 1 kJ/mol == 1 amu·nm²/ps² (the MD unit identity) ⇒ 1 kcal/mol = 4.184
_KCAL_TO_MD = 4.184
from pita_tpu.targets.forcefield import BOLTZMANN_KCAL


@dataclasses.dataclass(frozen=True)
class MDConfig:
    temperature: float = 300.0  # K
    friction: float = 1.0  # 1/ps
    dt: float = 0.001  # ps (1 fs; reference uses 1-2 fs with constraints)
    n_steps: int = 10000
    report_interval: int = 100


class MDResult(NamedTuple):
    positions: jnp.ndarray  # (n_frames, R, dim) nm
    velocities: jnp.ndarray  # final velocities
    potential_energies: jnp.ndarray  # (n_frames, R) kcal/mol


def langevin_md(key, target, x0: jnp.ndarray, cfg: MDConfig) -> MDResult:
    """BAOAB Langevin dynamics; x0: (R, dim) replicas in nm."""
    masses_amu = np.asarray(
        [_mass_of(t) for t in target.topology["types"]], np.float32
    )
    m = jnp.repeat(jnp.asarray(masses_amu), 3)[None, :]  # (1, dim)
    kT = BOLTZMANN_KCAL * cfg.temperature * _KCAL_TO_MD  # amu nm²/ps²
    dt, gamma = cfg.dt, cfg.friction
    c1 = jnp.exp(-gamma * dt)
    c3 = jnp.sqrt(kT * (1 - c1**2))

    def force_md(x):
        # force in kcal/mol/nm → amu·nm/ps²
        _, f = target.log_prob_and_force(x)
        return f * (BOLTZMANN_KCAL * target.temperature) * _KCAL_TO_MD

    k_init, k_scan = jax.random.split(key)
    v = jax.random.normal(k_init, x0.shape) * jnp.sqrt(kT / m)

    def step(carry, k):
        x, v, f = carry
        v = v + 0.5 * dt * f / m  # B
        x = x + 0.5 * dt * v  # A
        v = c1 * v + c3 / jnp.sqrt(m) * jax.random.normal(k, v.shape)  # O
        x = x + 0.5 * dt * v  # A
        f = force_md(x)
        v = v + 0.5 * dt * f / m  # B
        return (x, v, f), None

    def chunk(carry, k):
        keys = jax.random.split(k, cfg.report_interval)
        carry, _ = jax.lax.scan(step, carry, keys)
        x, v, f = carry
        return carry, (x, target.energy_kcal(x))

    n_frames = cfg.n_steps // cfg.report_interval
    keys = jax.random.split(k_scan, n_frames)
    f0 = force_md(x0)
    (x, v, _), (frames, energies) = jax.lax.scan(chunk, (x0, v, f0), keys)
    return MDResult(frames, v, energies)


def _mass_of(t):
    from pita_tpu.targets.alp import _MASS

    return _MASS[t]


def generate_md_dataset(
    target,
    out_path: str,
    n_steps: int = 100000,
    n_replicas: int = 8,
    temperature: Optional[float] = None,
    seed: int = 0,
    checkpoint_every: int = 20000,
):
    """Run MD and dump a checkpointed .npz trajectory (generate_md.py:38-111)."""
    import os

    checkpoint_every = min(checkpoint_every, n_steps)
    cfg = MDConfig(
        temperature=temperature or target.temperature, n_steps=checkpoint_every
    )
    key = jax.random.PRNGKey(seed)
    x = jnp.tile(jnp.asarray(target.initial_structure())[None], (n_replicas, 1))
    x = x + jax.random.normal(key, x.shape) * 1e-3
    all_frames, all_energies = [], []
    run = jax.jit(lambda k, x: langevin_md(k, target, x, cfg))
    for c in range(max(n_steps // checkpoint_every, 1)):
        res = run(jax.random.fold_in(key, c), x)
        x = res.positions[-1]
        all_frames.append(np.asarray(res.positions))
        all_energies.append(np.asarray(res.potential_energies))
        np.savez(
            out_path,
            positions=np.concatenate(all_frames),
            energies=np.concatenate(all_energies),
            temperature=cfg.temperature,
        )
    return out_path
