"""Benchmark: LJ55 annealed-SDE sampler throughput on one chip.

Measures the full PITA inference hot loop (the headline workload,
BASELINE.md north star): debiased Euler–Maruyama steps on LJ55 with a
TRAINED EGNN(32, 3-layer) score/energy pair (the committed checkpoint asset
``pita_tpu/assets/bench_lj55.npz``, produced by ``scripts/make_bench_ckpt.py``
via the standard experiment pipeline at T=2.0) — per step: energy forward +
∇x U + ∂U/∂t (one fused XLA value+grad pass), score forward, exact
score-divergence (edge-operator Jacobian trace, nets/egnn_fast.py), FK weight
update, systematic resampling — all inside one compiled lax.scan, at 2048
chains.  (The experimental Pallas kernels are NOT used here — they were
rejected from production, see PERF.md.)

Reports the reference-parity mode and fast candidates side by side:
- ``exact``: the divergence recomputed every step (K=1) — exact parity with
  the reference's compiled vmap(jacrev) (sdes.py:199-203, utils.py:30-40);
- ``quadrature K=10``: the exact divergence on a 10-step grid, carried
  between (a quadrature choice for one smooth term of the FK integral);
- ``hutch_ess``: unbiased Hutchinson trace (2 probes) + adaptive
  ESS-triggered resampling (accumulate-until-degenerate removes the
  per-step selection pressure that biases noisy weights).

A quality gate accompanies the throughput (trained nets, real annealing
T=2.0 → T=1.667): every mode runs the identical annealing problem from the
same key; a candidate passes only if (a) its energy histogram agrees with
the exact-parity population (W2 within 0.25·σ of the MALA ground-truth
spread) and (b) it lands near the ground-truth energy histogram (W2 < 2σ).
The headline is the FASTEST gate-passing mode; with no passing candidate it
falls back to exact mode.

Resilience (VERDICT r2 missing #1): the tunneled TPU runtime loses its worker
under load, and a worker restart kills the PJRT client *irrecoverably* — so
in-process retry cannot always save the run.  The measurement therefore runs
in a SUBPROCESS driven by a supervisor (this file, no JAX imported at the
top level): transient device errors retry in-process with progressive
backoff; a dead process is relaunched on a degradation ladder (fewer chains →
fewer steps → quadrature-only) until something completes.  Exactly one JSON
line is printed on stdout no matter what.

``vs_baseline`` divides by an estimate of the reference implementation on
A100 (~3,400 chain·steps/s — see PERF.md; the reference publishes no sampler
numbers; the exact-mode ratio is reported alongside in ``details``).
"""

import json
import os
import subprocess
import sys
import time

A100_REFERENCE_CHAIN_STEPS_PER_SEC = 3400.0  # documented estimate, see PERF.md

ASSET = os.path.join(os.path.dirname(__file__), "pita_tpu", "assets", "bench_lj55.npz")

# degradation ladder: each entry is tried in a fresh subprocess until one
# completes.  n_chains/n_steps_t are the timing problem; n_chains_q/n_steps_q
# the quality-gate problem; with exact_timing False the exact-mode timing rep
# is skipped (its throughput is then reported from the quality run's wall
# clock, clearly labeled estimated).
LADDER = [
    dict(n_chains=2048, n_steps_t=100, n_chains_q=512, n_steps_q=400,
         exact_timing=True, timing_reps=3, degraded=0),
    dict(n_chains=1024, n_steps_t=100, n_chains_q=256, n_steps_q=400,
         exact_timing=True, timing_reps=3, degraded=1),
    dict(n_chains=512, n_steps_t=100, n_chains_q=256, n_steps_q=300,
         exact_timing=False, timing_reps=2, degraded=2),
    dict(n_chains=256, n_steps_t=50, n_chains_q=0, n_steps_q=0,
         exact_timing=False, timing_reps=1, degraded=3),
]
ATTEMPT_TIMEOUT_S = [2100, 1500, 1200, 900]


def _transient_device_error(e) -> bool:
    """Transient runtime failures worth retrying: JaxRuntimeError, plus the
    UNAVAILABLE/INTERNAL/DEADLINE errors a restarting tunneled worker
    surfaces as bare ValueError/RuntimeError."""
    import jax.errors

    if isinstance(e, jax.errors.JaxRuntimeError):
        return True
    if isinstance(e, (RuntimeError, ValueError)):
        msg = str(e)
        return any(
            s in msg
            for s in ("UNAVAILABLE", "INTERNAL", "DEADLINE", "TPU device error")
        )
    return False


def _retry(fn, what, retries=3):
    """In-process retry with progressive backoff (trainer.py analog)."""
    backoff = [10.0, 45.0, 90.0, 180.0]
    for attempt in range(retries + 1):
        try:
            return fn()
        except Exception as e:
            if attempt == retries or not _transient_device_error(e):
                raise
            wait = backoff[min(attempt, len(backoff) - 1)]
            print(
                f"[bench] device error in {what} ({type(e).__name__}); "
                f"retry in {wait:.0f}s ({attempt + 1}/{retries})",
                file=sys.stderr,
            )
            time.sleep(wait)


def run_mode(run, key, x1, n_chains, n_steps, n_rep, what):
    import jax

    def warm():
        r = run(key, x1)
        jax.block_until_ready(r.samples)
        return r

    _retry(warm, f"{what}:warmup")

    def timed():
        t0 = time.perf_counter()
        res = None
        for i in range(n_rep):
            res = run(jax.random.fold_in(key, i), x1)
        jax.block_until_ready(res.samples)
        return time.perf_counter() - t0, res

    elapsed, res = _retry(timed, f"{what}:timing")
    return n_rep * n_chains * n_steps / elapsed, res


def worker(cfg):
    """One measurement attempt. Prints the result JSON line on stdout."""
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

    n_chains = cfg["n_chains"]
    base = IntegratorConfig(
        end_resampling_step=10**9,  # trimmed per-config below
        resampling_interval=1,  # LJ13 config resamples every step
        resample_at_end=False,
        should_mean_free=True,
        divergence_chunk_size=min(256, n_chains),  # edge-operator chain block
    )
    # candidate modes, cheapest-divergence last. "hutch_ess" pairs the
    # unbiased Hutchinson trace with adaptive (ESS-triggered) resampling —
    # accumulate-until-degenerate removes the per-step selection pressure
    # that biases noisy weights (PERF.md), and is the 10x-throughput path.
    modes = {
        "exact": dict(),
        "quadrature_k10": dict(divergence_update_interval=10),
        "hutch_ess": dict(
            divergence_mode="hutchinson",
            hutchinson_probes=2,
            ess_resampling_threshold=0.5,
        ),
        # + divergence quadrature: the estimated div(b_t) on a 10-step grid;
        # per-step cost approaches the drift-only bound (score fwd + energy
        # value&grad), the throughput ceiling of the debiased sampler
        "hutch_ess_k10": dict(
            divergence_mode="hutchinson",
            hutchinson_probes=2,
            ess_resampling_threshold=0.5,
            divergence_update_interval=10,
        ),
    }

    scale = float(jnp.sqrt(sched.h(jnp.asarray(1.0)) / gamma_f))

    def make_run(c):
        return jax.jit(
            lambda k, x, c=c: integrate_sde(
                k, x, score, energy, ps, pe, sched, anneal, target,
                beta, c,
            )
        )

    # ---- throughput: short scans (timing only) --------------------------
    n_steps_t = cfg["n_steps_t"]
    x1 = (
        jax.random.normal(jax.random.fold_in(key, 2), (n_chains, dim)) * scale
    )
    details = {}
    for name, kw in modes.items():
        if name == "exact" and not cfg["exact_timing"]:
            continue
        c = base.replace(
            num_integration_steps=n_steps_t, end_resampling_step=n_steps_t, **kw
        )
        # exact mode is ~2 min per rep at 2048 chains — one timed rep keeps
        # the whole bench inside a driver-friendly window
        n_rep = 1 if name == "exact" else cfg["timing_reps"]
        cps, _ = run_mode(
            make_run(c), jax.random.fold_in(key, 3), x1, n_chains, n_steps_t,
            n_rep, name,
        )
        details[name] = round(cps, 1)
        print(f"[bench] {name}: {cps:.0f} chain*steps/s", file=sys.stderr)
        # small-HBM chip: drop the finished mode's executable before the
        # next compiles (round-2 lesson; persistent compile cache keeps the
        # recompile cost low)
        jax.clear_caches()

    # ---- quality gate: full annealing run per mode ----------------------
    quality_ok = False
    gate_ran = cfg["n_chains_q"] > 0
    if gate_ran:
        n_steps_q = cfg["n_steps_q"]
        n_chains_q = cfg["n_chains_q"]
        x1q = (
            jax.random.normal(jax.random.fold_in(key, 4), (n_chains_q, dim))
            * scale
        )
        e_mode = {}
        for name, kw in modes.items():
            # quality runs use the FULL pipeline — including the reference's
            # own MALA refinement stage (sde_integration.py:362-470), applied
            # IDENTICALLY to every mode so the divergence estimator is the
            # only difference. MALA is what restores within-mode width under
            # noisy Hutchinson weights (tests/test_annealing_oracle.py); its
            # cost amortizes to ~0 over a production-length run (30 MALA
            # steps vs 1000 integration steps).
            c = base.replace(
                num_integration_steps=n_steps_q,
                end_resampling_step=int(n_steps_q * 0.9),
                resample_at_end=True,
                post_mcmc_steps=30,
                adaptive_mcmc=True,
                dt_negative_time=5e-5,
                **kw,
            )
            t0 = time.perf_counter()
            _, res = run_mode(
                make_run(c), jax.random.fold_in(key, 5), x1q, n_chains_q,
                n_steps_q, 1, f"quality:{name}",
            )
            wall = time.perf_counter() - t0
            e_mode[name] = np.asarray(target.log_prob(res.samples))
            jax.clear_caches()
            if name == "exact" and "exact" not in details:
                # degraded rung skipped the exact timing rep; report the
                # quality run's wall-clock rate, labeled estimated
                details["exact_estimated_from_quality_run"] = round(
                    n_chains_q * n_steps_q / wall, 1
                )

        e_data = np.asarray(target.log_prob(jnp.asarray(asset["data_T_low"])))
        spread = float(np.std(e_data)) + 1e-9

        def w2(a, b):
            return float(np.sqrt(emd_1d_unequal(a, b, p=2)))

        # per-mode two-sided gate: agree with the exact-parity population
        # AND land near the ground-truth energy histogram
        w2_exact_gt = w2(e_mode["exact"], e_data)
        details["exact_vs_groundtruth_energy_w2"] = round(w2_exact_gt, 4)
        details["groundtruth_energy_spread"] = round(spread, 4)
        passing = {}
        passing["exact"] = w2_exact_gt < 2.0 * spread
        for name in modes:
            if name == "exact":
                continue
            w2_m = w2(e_mode["exact"], e_mode[name])
            w2_gt = w2(e_mode[name], e_data)
            details[f"exact_vs_{name}_energy_w2"] = round(w2_m, 4)
            details[f"{name}_vs_groundtruth_energy_w2"] = round(w2_gt, 4)
            passing[name] = (w2_m < 0.25 * spread) and (w2_gt < 2.0 * spread)
        details["modes_passing_gate"] = [k for k, v in passing.items() if v]
        quality_ok = any(passing[k] for k in modes if k != "exact")

    if gate_ran:
        timed_passing = [
            k for k in details["modes_passing_gate"] if k in details
        ]
        if timed_passing:
            headline_mode = max(timed_passing, key=lambda k: details[k])
        else:
            headline_mode = "exact" if "exact" in details else "quadrature_k10"
    else:
        # no quality run on this degraded rung: report the mode validated by
        # committed artifacts (PERF.md K=10 gate passes), never an untested one
        headline_mode = (
            "quadrature_k10" if "quadrature_k10" in details else "exact"
        )
    quality_ok = gate_ran and headline_mode in details.get(
        "modes_passing_gate", []
    )
    details["headline_mode"] = headline_mode
    headline = details[headline_mode]
    exact_cps = details.get("exact")
    out = {
        "metric": "lj55_sampler_chain_steps_per_sec_per_chip",
        "value": headline,
        "unit": "chain*steps/s",
        "vs_baseline": round(headline / A100_REFERENCE_CHAIN_STEPS_PER_SEC, 3),
        "details": {
            **details,
            "n_chains": n_chains,
            "trained_ckpt": True,
            "quality_gate_ok": quality_ok,
            "quality_gate_ran": gate_ran,
            "degraded": cfg["degraded"],
            **(
                {"exact_vs_baseline": round(
                    exact_cps / A100_REFERENCE_CHAIN_STEPS_PER_SEC, 3)}
                if exact_cps else {}
            ),
        },
    }
    print(json.dumps(out))


def _wait_for_device(max_wait_s=600):
    """Block until a tiny device dispatch succeeds (or give up)."""
    probe = (
        "import jax, jax.numpy as jnp; "
        "print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()))"
    )
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True, timeout=120
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        print("[bench] device probe failed; waiting 60s", file=sys.stderr)
        time.sleep(60)
    return False


def supervise():
    """Run the attempt ladder in subprocesses; print exactly one JSON line."""
    last_err = ""
    _wait_for_device(max_wait_s=300)
    for i, cfg in enumerate(LADDER):
        env = dict(os.environ, PITA_BENCH_WORKER=json.dumps(cfg))
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                timeout=ATTEMPT_TIMEOUT_S[i],
            )
        except subprocess.TimeoutExpired:
            last_err = f"attempt {i} timed out after {ATTEMPT_TIMEOUT_S[i]}s"
            print(f"[bench] {last_err}; degrading", file=sys.stderr)
            continue
        sys.stderr.write(proc.stderr[-4000:])
        line = next(
            (
                ln
                for ln in reversed(proc.stdout.strip().splitlines())
                if ln.startswith("{")
            ),
            None,
        )
        if proc.returncode == 0 and line:
            try:
                parsed = json.loads(line)
            except json.JSONDecodeError:
                last_err = f"attempt {i}: unparseable output"
                continue
            parsed["details"]["attempt"] = i
            parsed["details"]["wall_s"] = round(time.time() - t0, 1)
            print(json.dumps(parsed))
            return 0
        last_err = (
            f"attempt {i} rc={proc.returncode}: "
            + (proc.stderr.strip().splitlines() or ["no stderr"])[-1][:300]
        )
        print(f"[bench] {last_err}; degrading", file=sys.stderr)
        # a restarting tunneled worker takes minutes to come back — wait for
        # a probe dispatch to succeed (bounded) before burning the next rung
        _wait_for_device(max_wait_s=600)
    # every rung failed: still print a JSON line so the driver records
    # *something* machine-readable rather than rc=1 with no artifact
    print(
        json.dumps(
            {
                "metric": "lj55_sampler_chain_steps_per_sec_per_chip",
                "value": 0.0,
                "unit": "chain*steps/s",
                "vs_baseline": 0.0,
                "details": {"error": last_err, "all_attempts_failed": True},
            }
        )
    )
    return 1


if __name__ == "__main__":
    cfg_json = os.environ.get("PITA_BENCH_WORKER")
    if cfg_json:
        worker(json.loads(cfg_json))
    else:
        sys.exit(supervise())
