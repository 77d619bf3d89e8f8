"""Validate the divergence-quadrature interval K on LJ55 with trained nets.

VERDICT r1 weak #1/#7: the K=10 quadrature of the FK divergence term was
validated only on a 2-D analytic GMM oracle; this script validates it on the
actual LJ55 workload: load a trained checkpoint, run the full annealed FK
sampler with identical keys under K ∈ {1, 10, 20}, Hutchinson and Hutch++,
and compare final sample populations (energy W2 between modes and against the
target's test set, interatomic-distance W2, ESS).

Usage:
    python scripts/validate_divergence_quadrature.py \
        ckpt=runs/lj55_full/ckpt out=runs/lj55_full/kval.json [chains=2048]
"""

import json
import sys


def main(argv=None):
    opts = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    ckpt = opts["ckpt"]
    out_path = opts.get("out", "kval.json")
    n_chains = int(opts.get("chains", 2048))
    experiment = opts.get("experiment", "lj55")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pita_tpu.configs import compose, build_trainer
    from pita_tpu.io.checkpoint import restore_checkpoint
    from pita_tpu.metrics.distances import emd_1d_unequal, interatomic_dist_w2
    from pita_tpu.metrics.ess import effective_sample_size

    cfg = compose(experiment)
    trainer = build_trainer(cfg)
    restore_checkpoint(trainer, ckpt)

    index = trainer.active_temp_index()
    index = min(index, trainer.n_temps - 2)
    beta_hi = float(trainer.inverse_temperatures[index])
    beta_lo = float(trainer.inverse_temperatures[index + 1])
    target = trainer.targets[index + 1]

    modes = {
        "exact_k1": dict(divergence_update_interval=1),
        "quadrature_k10": dict(divergence_update_interval=10),
        "quadrature_k20": dict(divergence_update_interval=20),
        "hutchinson": dict(divergence_mode="hutchinson", hutchinson_probes=1),
        "hutchpp": dict(divergence_mode="hutchpp", hutchpp_rank=16,
                        hutchinson_probes=4),
    }
    key_data = jax.random.PRNGKey(7)
    data = target.sample_test_set(key_data, n_chains)
    e_data = np.asarray(target.log_prob(data))

    results = {}
    samples_by_mode = {}
    for name, kw in modes.items():
        icfg = trainer.integrator_cfg.replace(**kw)
        trainer.key = jax.random.PRNGKey(123)  # identical keys across modes
        res = trainer.generate_samples(
            target, n_chains, inverse_temp=beta_hi,
            annealing_factor=beta_lo / beta_hi, integrator_cfg=icfg,
        )
        s = res.samples
        samples_by_mode[name] = np.asarray(s)
        e = np.asarray(target.log_prob(s))
        lw_step = min(icfg.end_resampling_step, icfg.num_integration_steps) - 1
        results[name] = {
            "energy_mean": float(-e.mean()),
            "energy_w2_vs_data": float(np.sqrt(emd_1d_unequal(e, e_data, p=2))),
            "dist_w2_vs_data": float(interatomic_dist_w2(target, s, data)),
            "ess": float(
                effective_sample_size(res.logweights[lw_step], normalize=True)
            ),
        }
        print(name, results[name])

    e_ref = np.asarray(target.log_prob(jnp.asarray(samples_by_mode["exact_k1"])))
    for name, s in samples_by_mode.items():
        e = np.asarray(target.log_prob(jnp.asarray(s)))
        results[name]["energy_w2_vs_exact"] = float(
            np.sqrt(emd_1d_unequal(e, e_ref, p=2))
        )
    results["_meta"] = {
        "experiment": experiment, "ckpt": ckpt, "chains": n_chains,
        "anneal": [1 / beta_hi, 1 / beta_lo],
        "data_energy_std": float(e_data.std()),
    }
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
