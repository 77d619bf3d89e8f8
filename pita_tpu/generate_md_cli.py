"""MD data-generation entry point.

Reference parity: ``pita/src/generate_md.py`` (Hydra ``configs/md.yaml``) —
Langevin MD on a chosen peptide at a chosen temperature, with checkpointed
``.npz`` trajectory dumps.

    python -m pita_tpu.generate_md_cli peptide=aldp temperature=300 \
        n_steps=100000 out=data/aldp_md.npz
"""

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    from pita_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    opts = dict(a.split("=", 1) for a in argv)
    peptide = opts.get("peptide", "aldp")
    temperature = float(opts.get("temperature", 300.0))
    n_steps = int(opts.get("n_steps", 100000))
    n_replicas = int(opts.get("n_replicas", 8))
    seed = int(opts.get("seed", 0))
    out = opts.get("out", f"{peptide}_md_T{temperature:.0f}.npz")

    from pita_tpu.baselines.md import generate_md_dataset
    from pita_tpu.targets.alp import ALPEnergy

    target = ALPEnergy(peptide, temperature=temperature)
    path = generate_md_dataset(
        target, out, n_steps=n_steps, n_replicas=n_replicas, seed=seed
    )
    print(f"wrote {path}")
    return path


if __name__ == "__main__":
    main()
