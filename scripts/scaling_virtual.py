"""Wall-clock scaling curve of the sharded sampler on a virtual CPU mesh.

Complements the collective-payload accounting (scripts/measure_collectives.py,
docs/collectives.json) with an executed-wall-clock curve: ``sharded_integrate``
steps/s at 1/2/4/8 devices at FIXED global chain count (strong scaling), on
the 8-virtual-device CPU mesh (`--xla_force_host_platform_device_count`).

What this CAN and CANNOT show: the XLA:CPU backend parallelizes a SINGLE
device's program across all host cores (intra-op threading), so a virtual
8-device mesh shares the same cores as 1 device and the strong-scaling curve
is ~flat BY CONSTRUCTION — flatness at ~1.0x is the *expected* healthy
result, and the informative number is the OVERHEAD of 8-way sharding
(speedup_vs_1dev < 1 would mean the sharded program serializes on
collectives or replicated work). Per-step collective payload — the quantity
that does transfer to real ICI — is measured separately from compiled HLO
(scripts/measure_collectives.py: 1 KB/step vs the reference's ~41 KB
every-step DDP gather, sde_integration.py:248-258).

Writes docs/scaling_virtual.json.

Run:
    python scripts/scaling_virtual.py
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from pita_tpu.nets import EGNNBackbone, EnergyWrapper, ScoreWrapper  # noqa: E402
from pita_tpu.parallel.sharded import sharded_integrate  # noqa: E402
from pita_tpu.sampler import IntegratorConfig  # noqa: E402
from pita_tpu.schedules import (  # noqa: E402
    ConstantAnnealingSchedule,
    ElucidatingNoiseSchedule,
)
from pita_tpu.targets import LJ13  # noqa: E402

GLOBAL_CHAINS = 256
N_STEPS = 16
REPS = 2


def main():
    target = LJ13(temperature=2.0)
    dim = target.dim
    key = jax.random.PRNGKey(0)

    def backbone():
        return EGNNBackbone(
            n_particles=13, n_spatial_dim=3, hidden_nf=16, n_layers=2
        )

    score, energy = ScoreWrapper(backbone()), EnergyWrapper(backbone())
    ps = score.init(key, dim)
    pe = energy.init(jax.random.fold_in(key, 1), dim)
    sched = ElucidatingNoiseSchedule(sigma_min=0.05, sigma_max=80.0, rho=7.0)
    anneal = ConstantAnnealingSchedule(annealing_factor=1.2)
    cfg = IntegratorConfig(
        num_integration_steps=N_STEPS,
        end_resampling_step=N_STEPS,
        resampling_interval=1,
        should_mean_free=True,
        divergence_mode="hutchinson",
        hutchinson_probes=2,
    )
    scale = float(jnp.sqrt(sched.h(jnp.asarray(1.0)) / 1.2))
    x1 = jax.random.normal(jax.random.fold_in(key, 2), (GLOBAL_CHAINS, dim))
    x1 = x1 * scale

    devices = jax.devices()
    out = {
        "workload": f"LJ13 EGNN(16x2) hutch2, {GLOBAL_CHAINS} global chains, "
        f"{N_STEPS} steps (strong scaling)",
        "backend": "cpu-virtual",
        "curve": {},
    }
    for n_dev in (1, 2, 4, 8):
        mesh = Mesh(devices[:n_dev], axis_names=("chains",))

        def run():
            res = sharded_integrate(
                mesh, jax.random.fold_in(key, 3), x1, score, energy, ps, pe,
                sched, anneal, target, 1.0, cfg,
            )
            jax.block_until_ready(res.samples)
            return res

        run()  # compile + warm
        t0 = time.perf_counter()
        for _ in range(REPS):
            run()
        dt = (time.perf_counter() - t0) / REPS
        sps = N_STEPS / dt
        out["curve"][str(n_dev)] = {
            "steps_per_sec": round(sps, 2),
            "chain_steps_per_sec": round(sps * GLOBAL_CHAINS, 1),
            "wall_s_per_run": round(dt, 3),
        }
        print(f"{n_dev} devices: {sps:.2f} steps/s", flush=True)

    base = out["curve"]["1"]["steps_per_sec"]
    for n_dev, row in out["curve"].items():
        row["speedup_vs_1dev"] = round(row["steps_per_sec"] / base, 2)
    out["interpretation"] = (
        "XLA:CPU runs one device's program across all host cores, so the "
        "virtual-mesh strong-scaling curve is ~flat by construction; the "
        "informative number is the sharding OVERHEAD (speedup_vs_1dev ~1.0 "
        "= the 8-way sharded program adds no serialization or collective "
        "wall cost at fixed global work). ICI-relevant communication is "
        "measured from compiled HLO in docs/collectives.json."
    )
    os.makedirs("docs", exist_ok=True)
    with open("docs/scaling_virtual.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote docs/scaling_virtual.json")


if __name__ == "__main__":
    main()
