"""Score saved test-phase sample dumps without re-running the sampler.

``trainer.test`` (pita_tpu/train/trainer.py:935-1010; reference
``energytemp_module.py:1002-1081``) saves a
``samples_temperature_{Ti}_annealed_to_{Tj}.npz`` per ladder pair and then
computes the test metrics. When a chip run dies *between* pairs (or the
process is killed after the dumps are written), the samples survive but the
metrics were never logged. This script recomputes exactly the same metrics
from the dumps on CPU: subsample ``test_batch_size`` with the same
``np.random.default_rng(0)`` draw, score energies under the annealed-to
target, and compare against the committed ground-truth test set
(energy W2 / cropped W2 / dist W2 / energy mean, with the GT energy sigma
scale anchor).

Usage:
    JAX_PLATFORMS=cpu python scripts/test_metrics_offline.py \
        runs_r3/lj13_test/lj13 experiment=lj13 [energy.data_dir=data]

Writes ``<run_dir>/test_metrics.json`` and prints a markdown table row per
pair.
"""

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv):
    from pita_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    import numpy as np
    import jax
    import jax.numpy as jnp

    from pita_tpu.configs import compose, parse_overrides, build_trainer
    from pita_tpu.metrics.distances import energy_distances, interatomic_dist_w2

    run_dir = argv[0]
    experiment = "lj13"
    overrides = {}
    for a in argv[1:]:
        if a.startswith("experiment="):
            experiment = a.split("=", 1)[1]
        else:
            overrides.update(parse_overrides([a]))

    cfg = compose(experiment, overrides=overrides)
    trainer = build_trainer(cfg)
    temps = np.asarray(trainer.temperatures)

    pat = re.compile(
        r"samples_temperature_([0-9.]+)_annealed_to_([0-9.]+)\.npz$"
    )
    out = {}
    rows = []
    for path in sorted(glob.glob(os.path.join(run_dir, "samples_*.npz"))):
        m = pat.search(os.path.basename(path))
        if not m:
            continue
        Ti, Tj = float(m.group(1)), float(m.group(2))
        j = int(np.argmin(np.abs(temps - Tj)))
        target = trainer.targets[j]
        samples = np.load(path)["samples"]
        sub = samples[
            np.random.default_rng(0).integers(
                0, len(samples), cfg.trainer.test_batch_size
            )
        ]
        energies = target.log_prob(jnp.asarray(sub))
        key = jax.random.key(0)
        try:
            data = target.sample_test_set(key, len(sub))
        except (ValueError, NotImplementedError):
            data = None
        prefix = f"test/T={Ti:.2f}->{Tj:.2f}"
        mets = {}
        if data is not None:
            data_energies = target.log_prob(data)
            mets = energy_distances(
                energies,
                data_energies,
                prefix=prefix,
                energy_threshold=cfg.trainer.energy_masking_threshold,
            )
            mets[f"{prefix}/data_energy_std"] = float(jnp.std(data_energies))
            if trainer.is_molecule:
                mets[f"{prefix}/dist_w2"] = interatomic_dist_w2(
                    target, jnp.asarray(sub), data
                )
        mets[f"{prefix}/energy_mean"] = float(-jnp.mean(energies))
        mets = {k: float(v) for k, v in mets.items()}
        out.update(mets)

        def g(suffix):
            v = mets.get(f"{prefix}/{suffix}")
            return f"{v:.4g}" if v is not None else "—"

        rows.append(
            f"| {Ti:.2f}->{Tj:.2f} | {g('energy_w2')} | {g('energy_w2_cropped')} "
            f"| {g('dist_w2')} | {g('energy_mean')} | {g('data_energy_std')} |"
        )

    dest = os.path.join(run_dir, "test_metrics.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("| test pair | energy_w2 | energy_w2_cropped | dist_w2 | energy_mean | GT energy σ |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(r)
    print(f"\nwrote {dest}")


if __name__ == "__main__":
    main(sys.argv[1:])
