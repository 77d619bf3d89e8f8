"""On-chip validation of the G-operator Pallas kernel (VERDICT r3 next #5).

Three phases, each committed to docs/g_op_onchip.json as it completes:

1. **kernel parity, compiled on the TPU** (not interpret mode): the
   g_operator_contract kernel vs the materialized-G einsum at LJ55 shapes
   (N=55, F=32), max abs/rel error.
2. **end-to-end exact-divergence parity**: one short integrate_sde with
   ``divergence_g_kernel=True`` vs the XLA edge-operator path, same key.
3. **exact-mode timing**: chain·steps/s of the K=1 exact mode with and
   without the kernel on the bench problem (trained LJ55 checkpoint) —
   the number that decides whether the kernel closes the exact-parity gap
   to >=1x (sdes.py:199-203, utils.py:30-40) or gets a dated rejection.

Run (needs the TPU):
    PITA_TPU_ENABLE_EXPERIMENTAL_PALLAS=1 python scripts/validate_g_op_onchip.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("PITA_TPU_ENABLE_EXPERIMENTAL_PALLAS", "1")
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "docs", "g_op_onchip.json")
RESULTS = {"device": None, "phases": {}}


def commit(phase, **kv):
    RESULTS["phases"][phase] = kv
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"[g_op] {phase}: {kv}", flush=True)


def phase1_kernel_parity(key):
    from pita_tpu.ops.pallas.g_op import g_operator_contract

    N, F, T, B = 55, 32, 165, 8
    ks = jax.random.split(key, 7)
    sp1 = jax.random.uniform(ks[0], (B, N, N, F))
    sp2 = jax.random.uniform(ks[1], (B, N, N, F))
    att = jax.random.uniform(ks[2], (B, N, N))
    satq = jax.random.normal(ks[3], (B, N, N, F)) * 0.1
    m_pre = jax.random.normal(ks[4], (B, N, N, F))
    w2 = jax.random.normal(ks[5], (F, F)) / np.sqrt(F)
    bv = jax.random.normal(ks[6], (T, B, N, F)) * 0.5
    mask = 1.0 - jnp.eye(N)
    att_mask = att * mask
    satq_m = satq * mask[None, :, :, None]

    K = sp1[..., :, None] * w2[None, None, None] * sp2[..., None, :]
    G = att_mask[..., None, None] * K + satq_m[..., :, None] * m_pre[..., None, :]
    t2_ref = jnp.einsum(
        "bnmfg,tbmf->tbng", G.astype(jnp.float32), bv.astype(jnp.float32)
    )
    t0 = time.perf_counter()
    t2 = g_operator_contract(sp1, sp2, att_mask, satq_m, m_pre, w2, bv,
                             rows_per_block=8, interpret=False)
    jax.block_until_ready(t2)
    compile_and_run_s = time.perf_counter() - t0
    err = float(jnp.max(jnp.abs(t2 - t2_ref)))
    scale = float(jnp.max(jnp.abs(t2_ref))) + 1e-9
    commit(
        "kernel_parity",
        max_abs_err=err,
        max_rel_err=err / scale,
        compile_and_run_s=round(compile_and_run_s, 1),
        ok=bool(err / scale < 5e-2),
    )


def _bench_setup():
    from flax import serialization

    from pita_tpu.nets import EGNNBackbone, EnergyWrapper, ScoreWrapper
    from pita_tpu.schedules import (
        ConstantAnnealingSchedule,
        ElucidatingNoiseSchedule,
    )
    from pita_tpu.targets import LJ55

    asset = np.load(
        os.path.join(os.path.dirname(__file__), "..", "pita_tpu", "assets",
                     "bench_lj55.npz")
    )
    gamma = float(asset["gamma"])
    target = LJ55(smooth=True, temperature=float(asset["t_high"]) / gamma)
    key = jax.random.PRNGKey(0)

    def backbone():
        return EGNNBackbone(n_particles=55, n_spatial_dim=3, hidden_nf=32,
                            n_layers=3, compute_dtype=jnp.bfloat16)

    score, energy = ScoreWrapper(backbone()), EnergyWrapper(backbone())
    ps = serialization.from_bytes(score.init(key, target.dim),
                                  asset["score_params"].tobytes())
    pe = serialization.from_bytes(
        energy.init(jax.random.fold_in(key, 1), target.dim),
        asset["energy_params"].tobytes(),
    )
    sched = ElucidatingNoiseSchedule(sigma_min=0.05, sigma_max=80.0, rho=7.0)
    anneal = ConstantAnnealingSchedule(annealing_factor=gamma)
    scale = float(jnp.sqrt(sched.h(jnp.asarray(1.0)) / gamma))
    return target, score, energy, ps, pe, sched, anneal, scale, key


def phase2_e2e_parity():
    """Wiring check with resampling OFF: the divergence only enters the FK
    weights, so the G-kernel run must reproduce the XLA run's samples
    EXACTLY (same drift, same key) and its logweights to bf16 tolerance.

    (The first on-chip attempt ran with resampling every 2 steps: the
    bf16-vs-f32 difference in the divergence flipped an ancestor pick and
    the samples reindexed — max_rel_sample_diff 0.459 with final logweight
    diff 0.0, i.e. chaotic selection, not an operator bug; phase-1 operator
    parity was 2.0e-4. docs/g_op_onchip_attempt1.json preserves that run.)
    """
    from pita_tpu.sampler import IntegratorConfig, integrate_sde

    target, score, energy, ps, pe, sched, anneal, scale, key = _bench_setup()
    x1 = jax.random.normal(jax.random.fold_in(key, 2), (64, target.dim)) * scale
    base = IntegratorConfig(
        num_integration_steps=8, end_resampling_step=0,
        should_mean_free=True, divergence_chunk_size=64,
    )
    r0 = integrate_sde(jax.random.fold_in(key, 3), x1, score, energy, ps, pe,
                       sched, anneal, target, 1.0, base)
    r1 = integrate_sde(jax.random.fold_in(key, 3), x1, score, energy, ps, pe,
                       sched, anneal, target, 1.0,
                       base.replace(divergence_g_kernel=True,
                                    g_rows_per_block=8))
    d = float(jnp.max(jnp.abs(r1.samples - r0.samples)))
    s = float(jnp.max(jnp.abs(r0.samples))) + 1e-9
    lw0 = jnp.asarray(r0.logweights[-1])
    lw1 = jnp.asarray(r1.logweights[-1])
    lw = float(jnp.max(jnp.abs(lw1 - lw0)))
    lw_scale = float(jnp.max(jnp.abs(lw0))) + 1e-9
    commit("e2e_parity", max_rel_sample_diff=d / s,
           max_logweight_diff=lw, max_logweight_rel_diff=lw / lw_scale,
           ok=bool(d / s < 1e-6 and lw / lw_scale < 5e-2))
    jax.clear_caches()


def phase3_timing(n_chains=512, n_steps=50):
    from pita_tpu.sampler import IntegratorConfig, integrate_sde

    target, score, energy, ps, pe, sched, anneal, scale, key = _bench_setup()
    x1 = (
        jax.random.normal(jax.random.fold_in(key, 2), (n_chains, target.dim))
        * scale
    )
    out = {}
    for label, kw in [
        ("exact_xla", {}),
        ("exact_g_kernel", dict(divergence_g_kernel=True, g_rows_per_block=8)),
    ]:
        cfg = IntegratorConfig(
            num_integration_steps=n_steps, end_resampling_step=n_steps,
            resampling_interval=1, should_mean_free=True,
            divergence_chunk_size=min(64, n_chains), **kw,
        )
        run = jax.jit(lambda k, x, c=cfg: integrate_sde(
            k, x, score, energy, ps, pe, sched, anneal, target, 1.0, c))
        t0 = time.perf_counter()
        jax.block_until_ready(run(jax.random.fold_in(key, 4), x1).samples)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(run(jax.random.fold_in(key, 5), x1).samples)
        dt = time.perf_counter() - t0
        out[label] = dict(chain_steps_per_sec=round(n_chains * n_steps / dt, 1),
                          compile_s=round(compile_s, 1))
        commit(f"timing_{n_chains}", n_chains=n_chains, n_steps=n_steps, **out)
        jax.clear_caches()


def main():
    RESULTS["device"] = str(jax.devices()[0])
    phase1_kernel_parity(jax.random.PRNGKey(7))
    phase2_e2e_parity()
    phase3_timing()
    # production chain count: the XLA exact path measured ~2x faster at 2048
    # than 512 in round 2; time the kernel at the same rung for the ">=1x
    # exact parity" verdict (PERF.md drift table)
    phase3_timing(n_chains=2048, n_steps=50)
    print("[g_op] done")


if __name__ == "__main__":
    main()
