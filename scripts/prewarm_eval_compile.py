"""Pre-warm the eval/transition integrate compiles for a training config.

VERDICT r4 next #2a: the ALDP epoch-0 val-eval integrate compile needs
>5.5 min on the tunneled chip — longer than some session windows — which
forced round-4 ALDP to train without evals. This script AOT-compiles every
integrate program the run's evals and rung transitions will request
(Trainer.prewarm_eval_compiles) in a *sacrificial* process, filling the
persistent compilation cache; the training process then hits warm cache.
A wedged compile costs only this process, never the training window.

Usage (same experiment/override syntax as train_cli):

    JAX_COMPILATION_CACHE_DIR=.jax_cache \
        python scripts/prewarm_eval_compile.py experiment=aldp \
        energy.data_dir=data [epoch=200] [other.overrides=...]

``epoch=N`` pretends the run is at epoch N (e.g. a ladder resume) so the
active rung — and therefore the set of programs compiled — matches the run
being warmed. Writes docs/prewarm_<experiment>.json with per-program timings.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)


def main(argv):
    from pita_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    from pita_tpu.configs import compose, parse_overrides, build_trainer

    experiment = "gmm"
    epoch = 0
    overrides = {}
    for a in argv:
        if a.startswith("experiment="):
            experiment = a.split("=", 1)[1]
        elif a.startswith("epoch="):
            epoch = int(a.split("=", 1)[1])
        else:
            overrides.update(parse_overrides([a]))

    cfg = compose(experiment, overrides=overrides)
    trainer = build_trainer(cfg)
    trainer.epoch = epoch
    print(
        f"[prewarm] experiment={cfg.name} epoch={epoch} "
        f"rung={trainer.active_temp_index()}",
        flush=True,
    )
    timings = trainer.prewarm_eval_compiles()
    out = os.path.join(
        os.path.dirname(__file__), "..", "docs", f"prewarm_{cfg.name}.json"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump({"experiment": cfg.name, "epoch": epoch, "timings_s": timings}, f, indent=1)
    print(f"[prewarm] done: {timings}")


if __name__ == "__main__":
    main(sys.argv[1:])
