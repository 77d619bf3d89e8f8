"""Pre-generate the ALDP train/val/test MD datasets into data/ on CPU.

The ALP target generates missing datasets on first use (targets/alp.py
``_load_or_generate`` — 32-replica BAOAB MD, cached to
``{data_dir}/{peptide}_temp_{T:.2f}_{which}.npy``).  Stage F of the round-4
chip queue trains ALDP with ``energy.data_dir=data``; running this script
first (on CPU, while the chip is busy) makes the on-chip run find every set
in the cache instead of spending its window on dataset MD.

The generation path is IDENTICAL to what the trainer would run: the same
constructor (configs.registry make_target semantics), the same
``at_temperature`` rung copies, the same seeds (train=11/val=12/test=13
inside _load_or_generate) — only the backend differs, and JAX PRNG streams
are backend-independent.

Usage:  JAX_PLATFORMS=cpu python scripts/pregen_alp_data.py [peptide]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from pita_tpu.utils.platform import honor_platform_env

honor_platform_env()


def main():
    peptide = sys.argv[1] if len(sys.argv) > 1 else "aldp"
    from pita_tpu.configs.registry import compose

    cfg = compose(peptide)
    temps = cfg.trainer.temperatures
    from pita_tpu.targets.alp import ALPEnergy

    spec = dict(cfg.energy)
    spec.pop("kind")
    base = ALPEnergy(temperature=float(temps[0]), data_dir="data", **spec)
    for i, T in enumerate(temps):
        tgt = base.at_temperature(float(T))
        sets = ["val", "test"] + (["train"] if i == 0 else [])
        for which in sets:
            path = os.path.join(
                "data", f"{tgt.peptide}_temp_{tgt.temperature:.2f}_{which}.npy"
            )
            if os.path.exists(path):
                print(f"[pregen] exists: {path}")
                continue
            t0 = time.time()
            data = {
                "train": tgt.setup_train_set,
                "val": tgt.setup_val_set,
                "test": tgt.setup_test_set,
            }[which]()
            print(
                f"[pregen] {path}: {data.shape} in {time.time() - t0:.0f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
