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
