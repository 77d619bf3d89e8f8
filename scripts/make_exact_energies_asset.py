"""Capture the committed exact-parity energy population for the bench gate.

VERDICT r4 next #3: ``bench.py`` runs its quality gate two-sided only when
``pita_tpu/assets/bench_lj55_exact_energies.npy`` exists — the exact-parity
(K=1 divergence, reference semantics ``sdes.py:199-203``/``utils.py:30-40``)
energy population at the production quality shape (512 chains x 400 steps +
30-step adaptive MALA, the same configuration ``bench.py:quality_mode``
builds). Without the asset, driver-window captures gate one-sided against
the loose 2-sigma ground-truth band (``gate_exact_arm: "skipped"`` in
BENCH_r04.json). One on-chip run of this script closes that.

Run (needs the TPU; ~6-10 min incl. compile):

    python scripts/make_exact_energies_asset.py

Writes the .npy asset plus ``docs/exact_energies_asset.json`` (provenance:
W2 to ground truth, sigma anchor, wall time, device).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

HERE = os.path.dirname(os.path.abspath(__file__))
ASSET = os.path.join(HERE, "..", "pita_tpu", "assets", "bench_lj55.npz")
OUT_NPY = os.path.join(
    HERE, "..", "pita_tpu", "assets", "bench_lj55_exact_energies.npy"
)
OUT_JSON = os.path.join(HERE, "..", "docs", "exact_energies_asset.json")

# bench.py production quality shape (ladder[0]: n_chains_q=512, n_steps_q=400)
N_CHAINS, N_STEPS = 512, 400
MALA_STEPS = 30


def main():
    from pita_tpu.utils.platform import honor_platform_env

    honor_platform_env()
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
    gamma = float(asset["gamma"])
    target = LJ55(smooth=True, temperature=float(asset["t_high"]) / gamma)
    key = jax.random.PRNGKey(0)

    def backbone():
        return EGNNBackbone(
            n_particles=55, n_spatial_dim=3, hidden_nf=32, n_layers=3,
            compute_dtype=jnp.bfloat16,
        )

    score, energy = ScoreWrapper(backbone()), EnergyWrapper(backbone())
    ps = serialization.from_bytes(
        score.init(key, target.dim), asset["score_params"].tobytes()
    )
    pe = serialization.from_bytes(
        energy.init(jax.random.fold_in(key, 1), target.dim),
        asset["energy_params"].tobytes(),
    )
    sched = ElucidatingNoiseSchedule(sigma_min=0.05, sigma_max=80.0, rho=7.0)
    anneal = ConstantAnnealingSchedule(annealing_factor=gamma)
    scale = float(jnp.sqrt(sched.h(jnp.asarray(1.0)) / gamma))

    # bench.py quality_cfg, exact mode (no divergence shortcuts).
    # segment_size=100: host-level segmentation is bit-identical to the
    # single-dispatch program (test_segmented_integration_matches_single_
    # dispatch) but compiles a 4x smaller executable — the tunneled runtime
    # compiles server-side and a 400-step exact monolith has been observed
    # to exceed a 20-min window cold.
    cfg = IntegratorConfig(
        num_integration_steps=N_STEPS,
        end_resampling_step=int(N_STEPS * 0.9),
        resampling_interval=1,
        resample_at_end=True,
        post_mcmc_steps=MALA_STEPS,
        adaptive_mcmc=True,
        dt_negative_time=5e-5,
        should_mean_free=True,
        divergence_chunk_size=min(256, N_CHAINS),
        segment_size=100,
    )
    # bench.py seeds: x1q from fold_in(key, 4), run key fold_in(key, 5)
    x1 = (
        jax.random.normal(jax.random.fold_in(key, 4), (N_CHAINS, target.dim))
        * scale
    )
    # no outer jit: segmented mode manages its own per-segment jit (an outer
    # jit would re-inline the host segmentation loop into one huge program)
    t0 = time.perf_counter()
    res = integrate_sde(
        jax.random.fold_in(key, 5), x1, score, energy, ps, pe, sched, anneal,
        target, jnp.asarray(1.0), cfg,
    )
    jax.block_until_ready(res.samples)
    wall = time.perf_counter() - t0

    e_exact = np.asarray(target.log_prob(res.samples))
    e_data = np.asarray(target.log_prob(jnp.asarray(asset["data_T_low"])))
    sigma = float(np.std(e_data))
    w2 = float(np.sqrt(emd_1d_unequal(e_exact, e_data, p=2)))
    np.save(OUT_NPY, e_exact)
    prov = {
        "device": str(jax.devices()[0]),
        "n_chains": N_CHAINS,
        "n_steps": N_STEPS,
        "mala_steps": MALA_STEPS,
        "wall_s": round(wall, 1),
        "exact_vs_groundtruth_energy_w2": round(w2, 4),
        "groundtruth_energy_sigma": round(sigma, 4),
        "w2_in_sigma": round(w2 / sigma, 3),
        "mode": "exact (K=1 divergence every step, XLA edge-operator path)",
    }
    os.makedirs(os.path.dirname(OUT_JSON), exist_ok=True)
    with open(OUT_JSON, "w") as f:
        json.dump(prov, f, indent=1)
    print(json.dumps(prov))
    print(f"saved {OUT_NPY}")


if __name__ == "__main__":
    main()
