"""Measure per-step collective volume of the sharded sampler vs the reference.

The reference's DDP sampler all_gathers the FULL chain state every
Euler-Maruyama step (sde_integration.py:248-258: ``all_gather(x)`` of
(B, D) floats plus the (B,) weights, then a host-side resample). Our
sharded integrator keeps chains resident on their device for the whole run
and only the resampling decision needs global information — the log-weight
softmax/cumsum — so the only per-step collective is over (B,) scalars plus
the post-resample ancestor gather.

This script compiles ``sharded_integrate`` on a virtual CPU mesh (1/2/4/8
devices), parses the optimized HLO of the scan body, and accounts every
collective op's payload bytes — a hardware-independent measurement of the
communication the program issues per step (the bytes that would ride ICI on
a real slice). Writes the table into PARALLEL.md-ready JSON on stdout.

Run:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/measure_collectives.py
"""

import json
import os
import re
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

# this environment pre-imports jax at interpreter start with the TPU
# backend selected; env vars are too late — force CPU via jax.config
# before the backend initializes (tests/conftest.py does the same)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "s32": 4, "u64": 8, "u32": 4, "s8": 1, "u8": 1, "pred": 1,
}

COLLECTIVE_RE = re.compile(
    r"=\s*((?:\([^)]*\)|\S+))\s+"
    r"(all-gather|all-reduce|reduce-scatter|collective-permute|all-to-all)\("
)
SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> int:
    total = 0
    for dt, dims in SHAPE_RE.findall(shape_str):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def collective_bytes(hlo_text: str):
    """Sum payload bytes of collective ops, split by inside/outside the
    while-loop (scan) body — classified by each op's metadata op_name."""
    per_op = {}
    in_loop, outside, cond_only = 0, 0, 0
    for line in hlo_text.splitlines():
        m = COLLECTIVE_RE.search(line)
        if not m:
            continue
        b = shape_bytes(m.group(1))
        op = m.group(2)
        per_op[op] = per_op.get(op, 0) + b
        if "/while/body/" in line:
            in_loop += b
            # ops inside the lax.cond resample branch only execute on steps
            # where the resample fires (interval / ESS-trigger schedules)
            if "/cond/" in line or "branch_" in line:
                cond_only += b
        else:
            outside += b
    return in_loop, outside, cond_only, per_op


def main():
    from pita_tpu.nets import EGNNBackbone, EnergyWrapper, ScoreWrapper
    from pita_tpu.parallel import make_mesh
    from pita_tpu.parallel.sharded import sharded_integrate
    from pita_tpu.sampler import IntegratorConfig
    from pita_tpu.schedules import (
        ConstantAnnealingSchedule,
        ElucidatingNoiseSchedule,
    )
    from pita_tpu.targets import LJ13

    target = LJ13(smooth=True)
    dim = target.dim
    key = jax.random.PRNGKey(0)

    def backbone():
        return EGNNBackbone(n_particles=13, n_spatial_dim=3, hidden_nf=16, n_layers=2)

    score, energy = ScoreWrapper(backbone()), EnergyWrapper(backbone())
    ps = score.init(key, dim)
    pe = energy.init(jax.random.fold_in(key, 1), dim)
    sched = ElucidatingNoiseSchedule(sigma_min=0.05, sigma_max=80.0, rho=7.0)
    anneal = ConstantAnnealingSchedule(annealing_factor=1.2)

    n_steps = 16
    B = 256
    cfg = IntegratorConfig(
        num_integration_steps=n_steps,
        end_resampling_step=n_steps,
        resampling_interval=1,
        should_mean_free=True,
        divergence_mode="hutchinson",
    )
    x1 = jax.random.normal(jax.random.fold_in(key, 2), (B, dim))

    rows = []
    for n_dev in (1, 2, 4, 8):
        mesh = make_mesh(n_dev, axis_name="chains")
        # reproduce sharded_integrate's jit, but lower instead of run
        import functools
        from jax.sharding import NamedSharding, PartitionSpec as P

        chains = NamedSharding(mesh, P("chains"))
        repl = NamedSharding(mesh, P())

        @functools.partial(
            jax.jit, in_shardings=(repl, chains, repl, repl, repl)
        )
        def run(k, x, a, b, beta):
            from pita_tpu.sampler import integrate_sde

            return integrate_sde(
                k, x, score, energy, a, b, sched, anneal, target, beta, cfg
            )

        lowered = run.lower(key, x1, ps, pe, jnp.asarray(1.0))
        compiled = lowered.compile()
        hlo = compiled.as_text()
        in_loop, outside, cond_only, per_op = collective_bytes(hlo)
        rows.append(
            {
                "n_devices": n_dev,
                "collective_bytes_per_step": in_loop,
                "collective_bytes_resample_steps_only": cond_only,
                "collective_bytes_every_step": in_loop - cond_only,
                "collective_bytes_outside_loop": outside,
                "per_op_bytes": per_op,
            }
        )
        print(
            f"devices={n_dev}: per-step collectives {in_loop} B "
            f"(resample-branch-only {cond_only} B), "
            f"outside-loop {outside} B, ops={per_op}",
            file=sys.stderr,
        )

    # the reference's per-step communication: all_gather of the full chain
    # state (B, D) f32 + the (B,) weights (sde_integration.py:248-258);
    # every rank receives every other rank's shard: (n_dev-1)/n_dev * payload
    ref_rows = [
        {
            "n_devices": n,
            "reference_all_gather_bytes_per_step": int(
                (B * dim + B) * 4 * (n - 1) / n * n  # total traffic on the link
            ),
        }
        for n in (1, 2, 4, 8)
    ]
    print(
        json.dumps(
            {
                "problem": {
                    "target": "LJ13",
                    "n_chains": B,
                    "dim": dim,
                    "divergence": "hutchinson",
                },
                "sharded_integrate": rows,
                "reference_ddp_estimate": ref_rows,
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
