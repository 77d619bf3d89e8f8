"""Training entry point.

Reference parity: ``pita/src/train.py`` — seeds, instantiates the object graph
from the composed config, ``fit`` then ``test``, returns the optimized metric
for sweeps; crash-safe logging wrapper (utils.py:42-96 ``task_wrapper``).

Usage (hydra-style overrides):

    python -m pita_tpu.train_cli experiment=lj13 trainer.training_batch_size=256
    python -m pita_tpu.train_cli experiment=gmm debug=short
"""

import sys
import traceback


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    from pita_tpu.configs import compose, parse_overrides, build_trainer

    experiment = "gmm"
    debug = None
    yaml_path = None
    ckpt_path = None
    run_test = True
    overrides = {}
    for a in list(argv):
        if a.startswith("experiment="):
            experiment = a.split("=", 1)[1]
        elif a.startswith("debug="):
            debug = a.split("=", 1)[1]
        elif a.startswith("config="):
            yaml_path = a.split("=", 1)[1]
        elif a.startswith("ckpt_path="):
            ckpt_path = a.split("=", 1)[1]
        elif a.startswith("test="):
            run_test = a.split("=", 1)[1].lower() == "true"
        else:
            overrides.update(parse_overrides([a]))

    cfg = compose(experiment, overrides=overrides, debug=debug, yaml_path=yaml_path)
    print(f"experiment={cfg.name} tags={cfg.tags} out_dir={cfg.out_dir}")
    trainer = build_trainer(cfg)

    # crash-safe wrapper: always flush the logger (utils.py task_wrapper parity)
    metric = None
    try:
        trainer.fit(ckpt_path=ckpt_path, resume=ckpt_path is not None)
        if run_test:
            metrics = trainer.test()
            vals = [v for k, v in metrics.items() if "energy_w2" in k]
            metric = vals[0] if vals else None
    except Exception:
        traceback.print_exc()
        raise
    finally:
        if trainer.metrics_history:
            print(f"final metrics: {trainer.metrics_history[-1]}")
    return metric


if __name__ == "__main__":
    main()
