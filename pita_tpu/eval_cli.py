"""Evaluation entry point.

Reference parity: ``pita/src/eval.py`` — load a checkpoint, run the test phase
(final annealed sampling + metrics) only.

    python -m pita_tpu.eval_cli experiment=lj13 ckpt_path=outputs/lj13/ckpt
"""

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    from pita_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    from pita_tpu.configs import compose, parse_overrides, build_trainer
    from pita_tpu.io.checkpoint import restore_checkpoint

    experiment = "gmm"
    debug = None
    ckpt_path = None
    overrides = {}
    for a in argv:
        if a.startswith("experiment="):
            experiment = a.split("=", 1)[1]
        elif a.startswith("debug="):
            debug = a.split("=", 1)[1]
        elif a.startswith("ckpt_path="):
            ckpt_path = a.split("=", 1)[1]
        else:
            overrides.update(parse_overrides([a]))

    assert ckpt_path is not None, "eval requires ckpt_path=..."
    cfg = compose(experiment, overrides=overrides, debug=debug)
    trainer = build_trainer(cfg)
    restore_checkpoint(trainer, ckpt_path)
    metrics = trainer.test()
    for k, v in metrics.items():
        print(f"{k}: {v}")
    return metrics


if __name__ == "__main__":
    main()
