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


def multirun(argv):
    """Hydra-multirun-style sweep: ``-m key=a,b key2=x,y`` runs the cartesian
    product sequentially, suffixing each run's out_dir (test_sweeps.py
    capability; hydra's ``-m`` / submitit launcher stand-in)."""
    import itertools

    sweep_keys, sweep_vals, fixed = [], [], []
    for a in argv:
        if "=" in a and "," in a.split("=", 1)[1]:
            k, v = a.split("=", 1)
            sweep_keys.append(k)
            sweep_vals.append(v.split(","))
        else:
            fixed.append(a)
    results = {}
    for combo in itertools.product(*sweep_vals):
        run_args = fixed + [f"{k}={v}" for k, v in zip(sweep_keys, combo)]
        tag = "_".join(f"{k.split('.')[-1]}-{v}" for k, v in zip(sweep_keys, combo))
        if not any(a.startswith("name=") for a in run_args):
            run_args.append(f"name_suffix={tag}")
        print(f"=== multirun: {tag or 'single'} ===")
        results[tag] = main(run_args)
    print(f"multirun done: {results}")
    return results


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    from pita_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    if "-m" in argv or "--multirun" in argv:
        argv = [a for a in argv if a not in ("-m", "--multirun")]
        return multirun(argv)
    from pita_tpu.configs import compose, parse_overrides, build_trainer

    experiment = "gmm"
    debug = None
    yaml_path = None
    ckpt_path = None
    run_test = True
    name_suffix = None
    time_ckpt = None
    overrides = {}
    for a in list(argv):
        if a.startswith("name_suffix="):
            name_suffix = a.split("=", 1)[1]
        elif a.startswith("experiment="):
            experiment = a.split("=", 1)[1]
        elif a.startswith("debug="):
            debug = a.split("=", 1)[1]
        elif a.startswith("config="):
            yaml_path = a.split("=", 1)[1]
        elif a.startswith("ckpt_path="):
            ckpt_path = a.split("=", 1)[1]
        elif a.startswith("test="):
            run_test = a.split("=", 1)[1].lower() == "true"
        elif a.startswith("time_checkpoint_seconds="):
            # wall-clock checkpoint interval (configs/callbacks/
            # time_checkpoint.yaml capability); bounds the progress a
            # process-level retry can lose between validation epochs
            time_ckpt = float(a.split("=", 1)[1])
        else:
            overrides.update(parse_overrides([a]))

    cfg = compose(experiment, overrides=overrides, debug=debug, yaml_path=yaml_path)
    if name_suffix:
        cfg.name = f"{cfg.name}_{name_suffix}"
    print(f"experiment={cfg.name} tags={cfg.tags} out_dir={cfg.out_dir}")
    trainer = build_trainer(cfg, resume=ckpt_path is not None)

    # crash-safe wrapper: always flush the logger (utils.py task_wrapper parity)
    metric = None
    try:
        trainer.fit(
            ckpt_path=ckpt_path,
            resume=ckpt_path is not None,
            time_checkpoint_seconds=time_ckpt,
        )
        if run_test:
            # test from the saved checkpoint (train.py:110-119 tests from
            # ckpt_path="best"), not from whatever params are in memory
            metrics = trainer.test(ckpt_path=ckpt_path)
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
