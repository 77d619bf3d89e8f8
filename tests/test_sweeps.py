"""Sweep-style smoke runs: one tiny fit per experiment preset
(reference pita/tests/test_sweeps.py: hydra multirun over experiment=glob(*))."""

import numpy as np
import pytest

from pita_tpu.configs import EXPERIMENTS, compose, build_trainer


@pytest.mark.slow
@pytest.mark.parametrize("name", ["gmm", "dw4", "lj13"])
def test_experiment_one_epoch_fit(name, tmp_path):
    cfg = compose(
        name,
        debug="short",
        overrides={
            "out_dir": str(tmp_path),
            "trainer.max_epochs": 1,
            "trainer.num_init_samples": 128,
        },
    )
    trainer = build_trainer(cfg)
    history = trainer.fit(max_epochs=1)
    assert trainer.epoch == 1
    # metrics were produced at the validation epoch
    assert len(history) >= 1
    assert all(np.isfinite(v) for m in history for k, v in m.items() if k != "epoch")


@pytest.mark.slow
def test_score_only_debug_mode_runs(tmp_path):
    """configs/debug/score_only.yaml: energy losses zeroed, no debiasing."""
    cfg = compose(
        "gmm",
        debug="short",
        overrides={"out_dir": str(tmp_path), "loss.only_train_score": True,
                   "integrator.debias_inference": False,
                   "integrator.resampling_interval": -1,
                   "integrator.resample_at_end": False},
    )
    trainer = build_trainer(cfg)
    trainer.fit(max_epochs=1)
    last = trainer.metrics_history[-1]
    assert any("energy_mean" in k for k in last)


def test_multirun_cartesian(tmp_path):
    """-m key=a,b runs the cartesian product with suffixed run names."""
    from pita_tpu import train_cli

    results = train_cli.main([
        "-m", "experiment=gmm", "debug=short", "seed=1,2",
        f"out_dir={tmp_path}", "test=false",
    ])
    assert len(results) == 2
    import os

    runs = os.listdir(tmp_path)
    assert any("seed-1" in r for r in runs) and any("seed-2" in r for r in runs)
