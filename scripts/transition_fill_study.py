"""Transition-fill quality study: reference-parity vs ESS-mitigated fills,
across the healthy AND collapsed importance-weight regimes.

CPU-runnable evidence for the rung-transition fill policy
(``TrainerConfig.transition_min_fill_ess`` floor + escalated retries): the
analytic noised-GMM oracles drive the full FK sampler from GMM-40 to the
exact tempered product p^beta (no training involved — same machinery as
tests/test_annealing_oracle.py), at *island scale* (1024-chain dispatches, as
``max_chains_per_integrate`` forces on the small-HBM chip, where the LJ55
round-3 ladder collapsed: the trainer-measured fill ESS — the no-resampling
diagnostic pass — sat at 0.005-0.018).

beta sweeps the regime: beta=2 is healthy (raw fill ESS ~0.5+, parity fills
are fine and the round-3 study showed the mitigation REGRESSES there);
higher betas shrink the raw fill ESS toward the LJ55 collapse band, which is
where the mitigation must win for the ESS-floor-gated escalation
(registry lj55/aldp presets) to be justified.

Per (beta, policy): mode-occupancy TV and within-mode variance ratio vs the
exact tempered ensemble, sample-space W2, modes occupied, final
unique-ancestor counts.  Per beta: the trainer-style raw fill ESS anchor.

Writes docs/transition_fill_study.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pita_tpu.utils.platform import honor_platform_env

honor_platform_env()

import jax
import jax.numpy as jnp
import numpy as np

from pita_tpu.metrics.distances import wasserstein2_exact
from pita_tpu.metrics.ess import effective_sample_size
from pita_tpu.sampler import IntegratorConfig, integrate_sde
from pita_tpu.schedules import ElucidatingNoiseSchedule, ConstantAnnealingSchedule
from pita_tpu.targets import GMM40, gmm_power
from pita_tpu.targets.gmm import GMMScoreOracle, GMMEnergyOracle

SCHED = ElucidatingNoiseSchedule(sigma_min=0.01, sigma_max=80.0, rho=7.0)
N_TOTAL = 2048
ISLAND = 1024  # the real LJ55 island size (max_chains_per_integrate)


def _cfg(ess_threshold, post_mcmc):
    return IntegratorConfig(
        num_integration_steps=1000,
        end_resampling_step=930,
        resampling_interval=1,
        resample_at_end=True,
        should_mean_free=False,
        divergence_mode="exact",
        post_mcmc_steps=post_mcmc,
        adaptive_mcmc=True,
        dt_negative_time=1e-2,
        ess_resampling_threshold=ess_threshold,
    )


def _problem(beta):
    base = GMM40()
    target = gmm_power(base, beta)
    anneal = ConstantAnnealingSchedule(annealing_factor=float(beta))
    scale = float(np.sqrt(SCHED.h(jnp.asarray(1.0)) / float(beta)))
    return base, target, anneal, scale


def raw_fill_ess(key, beta):
    """The trainer's fill-quality quantity: normalized ESS of the final
    accumulated log-weights on a NO-resampling pass (trainer.py evaluate —
    the number that sat at 0.005-0.018 on the LJ55 rung transitions)."""
    base, target, anneal, scale = _problem(beta)
    cfg = _cfg(None, 0)
    key, k_prior, k_int = jax.random.split(key, 3)
    x1 = jax.random.normal(k_prior, (ISLAND, 2)) * scale
    res = integrate_sde(
        k_int, x1, GMMScoreOracle(base), GMMEnergyOracle(base), {}, {},
        SCHED, anneal, target, 1.0, cfg,
        resampling_interval=cfg.num_integration_steps + 1,
    )
    lw = res.logweights[cfg.end_resampling_step - 1]
    return float(effective_sample_size(lw, normalize=True))


def run_islands(key, ess_threshold, post_mcmc, beta, n_total=N_TOTAL):
    base, target, anneal, scale = _problem(beta)
    cfg = _cfg(ess_threshold, post_mcmc)
    fills, uniq = [], []
    for _ in range(n_total // ISLAND):
        key, k_prior, k_int = jax.random.split(key, 3)
        x1 = jax.random.normal(k_prior, (ISLAND, 2)) * scale
        res = integrate_sde(
            k_int, x1, GMMScoreOracle(base), GMMEnergyOracle(base), {}, {},
            SCHED, anneal, target, 1.0, cfg,
        )
        fills.append(np.asarray(res.samples))
        uniq.append(int(np.asarray(res.num_unique)[-1]))
    return np.concatenate(fills), base, target, uniq


def stats(fill, base, target, key):
    locs = np.asarray(base.locs)
    ref = np.asarray(target.sample(key, len(fill)))
    ref = ref.reshape(len(fill), -1)

    def occ_var(s):
        m = ((s[:, None, :] - locs[None]) ** 2).sum(-1).argmin(1)
        occ = np.bincount(m, minlength=len(locs)) / len(s)
        return occ, ((s - locs[m]) ** 2).mean()

    occ_f, var_f = occ_var(fill)
    occ_r, var_r = occ_var(ref)
    n = min(len(fill), 2048)
    idx = np.random.default_rng(0).permutation(len(fill))[:n]
    return {
        "occupancy_tv": float(0.5 * np.abs(occ_f - occ_r).sum()),
        "within_mode_var_ratio": float(var_f / var_r),
        "w2_to_exact": float(wasserstein2_exact(fill[idx], ref[:n])),
        "modes_occupied": int((occ_f > 0).sum()),
        "modes_occupied_exact": int((occ_r > 0).sum()),
    }


# (label, ess_threshold, post_mcmc, n_total). "escalated_2x_thr0.3_mcmc30" is
# the trainer's floor-gated retry shape (TrainerConfig.transition_min_fill_
# ess): ESS-trigger 0.3 + 30 extra MALA steps + doubled chains — the buffer
# the next rung actually trains on after one escalation. The others isolate
# each ingredient (trigger threshold, MALA alone, chains alone).
POLICIES = [
    ("parity", None, 0, N_TOTAL),
    ("mit_thr0.3_mcmc20", 0.3, 20, N_TOTAL),
    ("mit_thr0.1_mcmc30", 0.1, 30, N_TOTAL),
    ("parity_mcmc30", None, 30, N_TOTAL),
    ("escalated_2x_mcmc30", None, 30, 2 * N_TOTAL),
    ("escalated_2x_thr0.3_mcmc30", 0.3, 30, 2 * N_TOTAL),
]

OUT_PATH = "docs/transition_fill_study.json"


def main():
    betas = [int(b) for b in (sys.argv[1:] or ["2", "4", "8", "16"])]
    out = {
        "target": "GMM-40 -> exact p^beta (oracle-driven)",
        "island": ISLAND,
        "raw_fill_ess": {},
        "modes": {},
    }
    if os.path.exists(OUT_PATH):  # merge into prior sweep results
        try:
            with open(OUT_PATH) as f:
                prior = json.load(f)
            out["raw_fill_ess"].update(prior.get("raw_fill_ess", {}))
            out["modes"].update(prior.get("modes", {}))
        except (json.JSONDecodeError, OSError):
            pass
    for beta in betas:
        ess = raw_fill_ess(jax.random.PRNGKey(5), beta)
        out["raw_fill_ess"][f"beta{beta}"] = ess
        print(f"beta={beta}: raw fill ESS (no-resample) = {ess:.5f}", flush=True)
        for label, thr, mcmc, n_total in POLICIES:
            mode_key = f"beta{beta}_{label}"
            if mode_key in out["modes"]:
                continue
            fill, base, target, uniq = run_islands(
                jax.random.PRNGKey(17), thr, mcmc, beta, n_total
            )
            s = stats(fill, base, target, jax.random.PRNGKey(99))
            s["final_unique_ancestors_per_island"] = uniq
            s["n_total"] = n_total
            out["modes"][mode_key] = s
            print(beta, label, s, flush=True)
            # keep partial results on disk as the sweep progresses
            os.makedirs("docs", exist_ok=True)
            with open(OUT_PATH, "w") as f:
                json.dump(out, f, indent=1)
    print(f"wrote {OUT_PATH}")


if __name__ == "__main__":
    main()
