"""Island vs global resampling: estimator-variance comparison (CPU).

Single-chip chain-island generation (per-island systematic resampling,
trainer.py `max_chains_per_integrate`) is a different SMC estimator than the
reference's global resample (sde_integration.py:292-296), which the sharded
path implements. This script quantifies the difference on the analytic
tempered-GMM oracle: annealing GMM-40 → p² with exact FK weights, comparing

  - global: one 2048-chain population (what `sharded_integrate` does),
  - island: 4 × 512 chains resampled independently (the single-chip
    bounded-memory fallback),

over several seeds; reports mean/std of population statistics (mean energy,
within-mode variance, mode-occupancy TV) for both, plus the ESS-triggered
resampling trigger rate at threshold 0.5 (the PARALLEL.md numbers).

Run:  python scripts/island_variance.py   (forces CPU; ~10 min on 1 core)
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pita_tpu.sampler import IntegratorConfig, integrate_sde  # noqa: E402
from pita_tpu.schedules import (  # noqa: E402
    ConstantAnnealingSchedule,
    ElucidatingNoiseSchedule,
)
from pita_tpu.targets import GMM40, gmm_power  # noqa: E402
from pita_tpu.targets.gmm import GMMEnergyOracle, GMMScoreOracle  # noqa: E402

SCHED = ElucidatingNoiseSchedule(sigma_min=0.01, sigma_max=80.0, rho=7.0)
N_STEPS = 400
N_CHAINS = 2048
N_ISLANDS = 4
N_SEEDS = 8


def run_once(key, n_chains, ess_threshold=None):
    base = GMM40()
    anneal = ConstantAnnealingSchedule(annealing_factor=2.0)
    cfg = IntegratorConfig(
        num_integration_steps=N_STEPS,
        end_resampling_step=int(N_STEPS * 0.93),
        resampling_interval=1,
        resample_at_end=True,
        should_mean_free=False,
        ess_resampling_threshold=ess_threshold,
    )
    scale = float(np.sqrt(SCHED.h(jnp.asarray(1.0)) / 2.0))
    k_prior, k_int = jax.random.split(key)
    x1 = jax.random.normal(k_prior, (n_chains, 2)) * scale
    res = integrate_sde(
        k_int, x1, GMMScoreOracle(base), GMMEnergyOracle(base), {}, {},
        SCHED, anneal, gmm_power(base, 2), 1.0, cfg,
    )
    return res, base


def stats(samples, base):
    locs = np.asarray(base.locs)
    s = np.asarray(samples)
    m = ((s[:, None, :] - locs[None]) ** 2).sum(-1).argmin(1)
    within_var = float(((s - locs[m]) ** 2).mean())
    occ = np.bincount(m, minlength=len(locs)) / len(s)
    return within_var, occ


def main():
    base = GMM40()
    target = gmm_power(base, 2)
    k_ref = jax.random.PRNGKey(1234)
    ref = target.sample(k_ref, N_CHAINS)
    var_ref, occ_ref = stats(ref, base)

    out = {"n_steps": N_STEPS, "n_chains": N_CHAINS, "n_islands": N_ISLANDS,
           "n_seeds": N_SEEDS, "within_var_exact": var_ref}
    for mode in ("global", "island"):
        vs, tvs = [], []
        for seed in range(N_SEEDS):
            key = jax.random.PRNGKey(seed)
            if mode == "global":
                res, _ = run_once(key, N_CHAINS)
                samples = np.asarray(res.samples)
            else:
                parts = []
                for i in range(N_ISLANDS):
                    res, _ = run_once(
                        jax.random.fold_in(key, i), N_CHAINS // N_ISLANDS
                    )
                    parts.append(np.asarray(res.samples))
                samples = np.concatenate(parts)
            v, occ = stats(samples, base)
            vs.append(v)
            tvs.append(0.5 * np.abs(occ - occ_ref).sum())
        out[mode] = {
            "within_var_mean": float(np.mean(vs)),
            "within_var_std": float(np.std(vs)),
            "occupancy_tv_mean": float(np.mean(tvs)),
            "occupancy_tv_std": float(np.std(tvs)),
        }
        print(mode, out[mode], file=sys.stderr)

    # ESS-trigger rate at threshold 0.5 (global population): fraction of
    # in-window steps on which the resample actually fired — num_unique < B
    # marks fired steps (skip branch reports B)
    res, _ = run_once(jax.random.PRNGKey(99), N_CHAINS, ess_threshold=0.5)
    nu = np.asarray(res.num_unique)[: int(N_STEPS * 0.93)]
    fired = float(np.mean(nu < N_CHAINS))
    out["ess_trigger_rate_at_0.5"] = fired
    print(f"ESS trigger rate @0.5: {fired:.3f}", file=sys.stderr)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
