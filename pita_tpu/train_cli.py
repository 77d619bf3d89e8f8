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


def sweep(argv):
    """Random-search sweeper (the reference's hydra-optuna plugin capability,
    environment.yaml:41, with optuna's default TPE swapped for seeded random
    search — optuna is not vendored). Range args sample per trial:

        key=lo:hi     float range (log-uniform when 0 < lo and hi/lo >= 10)
        key=a,b,c     uniform choice

    ``sweep_trials=N`` (default 8) and ``sweep_seed=S`` control the search.
    Minimizes the metric ``main`` returns (val energy_w2); prints and returns
    the best trial."""
    import random
    import re

    trials, seed, ranges, fixed = 8, 0, [], []
    for a in argv:
        if a.startswith("sweep_trials="):
            trials = int(a.split("=", 1)[1])
        elif a.startswith("sweep_seed="):
            seed = int(a.split("=", 1)[1])
        elif "=" in a and re.fullmatch(
            r"[-+0-9.eE]+:[-+0-9.eE]+", a.split("=", 1)[1]
        ):
            k, v = a.split("=", 1)
            lo, hi = (float(x) for x in v.split(":"))
            ranges.append((k, ("range", lo, hi)))
        elif "=" in a and "," in a.split("=", 1)[1]:
            k, v = a.split("=", 1)
            ranges.append((k, ("choice", v.split(","))))
        else:
            fixed.append(a)
    rng = random.Random(seed)
    import math

    best, results = None, []
    for t in range(trials):
        draw = {}
        for k, spec in ranges:
            if spec[0] == "range":
                _, lo, hi = spec
                if lo > 0 and hi / lo >= 10:
                    draw[k] = math.exp(rng.uniform(math.log(lo), math.log(hi)))
                else:
                    draw[k] = rng.uniform(lo, hi)
            else:
                draw[k] = rng.choice(spec[1])
        run_args = fixed + [f"{k}={v}" for k, v in draw.items()]
        run_args.append(f"name_suffix=trial{t}")
        print(f"=== sweep trial {t}/{trials}: {draw} ===")
        try:
            metric = main(run_args)
        except Exception:
            traceback.print_exc()
            metric = None
        results.append((t, draw, metric))
        if metric is not None and (best is None or metric < best[2]):
            best = (t, draw, metric)
    print(f"sweep done; best trial: {best}")
    return best


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    from pita_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    if "--sweep" in argv:
        return sweep([a for a in argv if a != "--sweep"])
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
