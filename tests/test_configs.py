"""Config composition tests (reference pita/tests/test_configs.py capability:
every experiment preset composes and instantiates)."""

import pytest

from pita_tpu.configs import EXPERIMENTS, compose, build_trainer, parse_overrides


@pytest.mark.parametrize("name", [n for n in EXPERIMENTS if n != "aldp"])
def test_every_experiment_composes_and_builds(name, tmp_path):
    cfg = compose(name, overrides={"out_dir": str(tmp_path)}, debug="short")
    trainer = build_trainer(cfg)
    assert trainer.n_temps == len(cfg.trainer.temperatures)
    assert trainer.dim == trainer.targets[0].dim


def test_overrides_reach_nested_dataclasses(tmp_path):
    cfg = compose(
        "gmm",
        overrides={
            "trainer.training_batch_size": 17,
            "loss.w_score": 0.25,
            "integrator.num_integration_steps": 7,
            "net.hidden_size": 24,
        },
    )
    assert cfg.trainer.training_batch_size == 17
    assert cfg.loss.w_score == 0.25
    assert cfg.integrator.num_integration_steps == 7
    assert cfg.net["hidden_size"] == 24


def test_debug_short_overlay_shrinks_everything():
    cfg = compose("lj13", debug="short")
    assert cfg.integrator.num_integration_steps == 2
    assert cfg.trainer.training_batch_size == 32


def test_score_only_overlay():
    cfg = compose("gmm", debug="score_only")
    assert cfg.loss.only_train_score
    assert not cfg.integrator.debias_inference


def test_parse_overrides_coercion():
    out = parse_overrides(
        ["a.b=3", "c=1.5", "d=true", "e=null", "f=hello", "g=1,2,3"]
    )
    assert out == {
        "a.b": 3, "c": 1.5, "d": True, "e": None, "f": "hello", "g": (1, 2, 3)
    }


def test_yaml_overlay(tmp_path):
    p = tmp_path / "overlay.yaml"
    p.write_text("trainer.lr: 0.01\nloss.w_energy_matching: 2.0\n")
    cfg = compose("gmm", yaml_path=str(p))
    assert cfg.trainer.lr == 0.01
    assert cfg.loss.w_energy_matching == 2.0


@pytest.mark.slow
def test_cli_smoke(tmp_path):
    """python -m pita_tpu.train_cli experiment=gmm debug=short (1-epoch run)."""
    from pita_tpu import train_cli

    train_cli.main(
        [
            "experiment=gmm",
            "debug=short",
            f"out_dir={tmp_path}",
            "trainer.temperatures=2.0,1.0",
            "trainer.num_epochs_per_temp=1,",
            "trainer.max_epochs=1",
            "test=false",
        ]
    )
    import os

    assert os.path.exists(tmp_path / "gmm" / "metrics.csv")


def test_new_presets_compose():
    from pita_tpu.configs import compose

    for name in ("al3", "al4", "alp_diffusion_baseline"):
        cfg = compose(name, debug="short")
        assert cfg.name == name
    cfg = compose("al3")
    assert cfg.trainer.temperatures == (1200.0, 755.95, 555.52, 408.24, 300.0)
    assert cfg.trainer.temps_to_anneal_test == ((600.0, 600.0),)
    b = compose("alp_diffusion_baseline")
    assert b.integrator.resampling_interval == -1
    assert b.integrator.debias_inference is False
    assert b.loss.w_energy_score == 0.0


def test_lr_schedule_and_early_stopping_knobs():
    from pita_tpu.configs import compose, build_trainer

    cfg = compose(
        "gmm", debug="short",
        overrides={
            "trainer.lr_schedule": "cosine",
            "trainer.early_stopping_metric": "val/energy_w2",
            "trainer.early_stopping_patience": 1,
        },
    )
    tr = build_trainer(cfg)
    assert tr.cfg.lr_schedule == "cosine"
    # one train epoch runs under the scheduled optimizer
    tr.populate_initial_buffer()
    aux = tr.train_one_epoch()
    assert "score_loss" in "".join(aux)


def test_tensorboard_logger(tmp_path):
    from pita_tpu.io.logging import make_logger

    lg = make_logger(str(tmp_path), kinds=("tensorboard", "csv"))
    lg.log_metrics({"a/b": 1.0}, step=3)
    import os

    assert os.path.isdir(tmp_path / "tb") and len(os.listdir(tmp_path / "tb")) > 0


def test_csv_logger_appends_on_resume(tmp_path):
    """A fresh process resuming a run must not truncate metrics.csv
    (crash-safe resume parity: utils.py:42-96 keeps Lightning's CSV intact
    because Lightning versions the log dir; we keep one file and append)."""
    from pita_tpu.io.logging import CSVLogger

    lg = CSVLogger(str(tmp_path))
    lg.log_metrics({"loss": 1.0}, step=0)
    lg.log_metrics({"loss": 0.5, "extra": 2.0}, step=1)
    # simulate the resumed process: a brand-new logger over the same dir
    lg2 = CSVLogger(str(tmp_path), resume=True)
    lg2.log_metrics({"loss": 0.25}, step=2)
    import csv as _csv

    with open(lg2.path, newline="") as f:
        rows = list(_csv.DictReader(f))
    assert [r["step"] for r in rows] == ["0", "1", "2"]
    assert rows[1]["extra"] == "2.0"
    assert rows[0]["loss"] == "1.0"
    # a NON-resume logger over the same dir must start clean (ADVICE r3):
    # two unrelated runs' histories must not merge
    lg3 = CSVLogger(str(tmp_path))
    lg3.log_metrics({"loss": 9.0}, step=0)
    with open(lg3.path, newline="") as f:
        rows = list(_csv.DictReader(f))
    assert [r["step"] for r in rows] == ["0"] and rows[0]["loss"] == "9.0"


def test_csv_logger_launch_id_disambiguates_relaunches(tmp_path):
    """VERDICT r4 next #7: repeated cold launches appended into one CSV made
    two bit-identical step-0 epochs look like progress (runs_r4/aldp). Every
    process gets a launch id; resumed rows carry a NEW id."""
    import csv as _csv

    from pita_tpu.io.logging import CSVLogger

    lg = CSVLogger(str(tmp_path))
    assert lg.launch_id == 0
    lg.log_metrics({"loss": 1.0}, step=0)
    # relaunch (resume): same step logged again must be attributable
    lg2 = CSVLogger(str(tmp_path), resume=True)
    assert lg2.launch_id == 1
    lg2.log_metrics({"loss": 1.0}, step=0)
    lg3 = CSVLogger(str(tmp_path), resume=True)
    assert lg3.launch_id == 2
    lg3.log_metrics({"loss": 0.5}, step=1)
    with open(lg3.path, newline="") as f:
        rows = list(_csv.DictReader(f))
    assert [(r["step"], r["launch"]) for r in rows] == [
        ("0", "0"), ("0", "1"), ("1", "2")
    ]
    # legacy CSVs without the column resume cleanly (column appears, old
    # rows stay blank, new launch id = 1)
    legacy = tmp_path / "legacy"
    legacy.mkdir()
    with open(legacy / "metrics.csv", "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=["step", "loss"])
        w.writeheader()
        w.writerow({"step": 0, "loss": 2.0})
    lg4 = CSVLogger(str(legacy), resume=True)
    assert lg4.launch_id == 1
    lg4.log_metrics({"loss": 1.5}, step=1)
    with open(lg4.path, newline="") as f:
        rows = list(_csv.DictReader(f))
    assert rows[0]["launch"] == "" and rows[1]["launch"] == "1"


def test_nested_tuple_override_coercion():
    """Nested sequences in CLI overrides (e.g. temps_to_anneal_test pairs)."""
    from pita_tpu.configs import parse_overrides

    ov = parse_overrides(
        [
            "trainer.temps_to_anneal_test=((1.5,1.2),(1.2,1.0))",
            "trainer.num_epochs_per_temp=(100,100,100)",
            "a=[1,2]",
            "b=x,y",
        ]
    )
    assert ov["trainer.temps_to_anneal_test"] == ((1.5, 1.2), (1.2, 1.0))
    assert ov["trainer.num_epochs_per_temp"] == (100, 100, 100)
    assert ov["a"] == (1, 2)
    assert ov["b"] == ("x", "y")


def test_make_logger_gated_backends_skip(tmp_path, capsys):
    """mlflow/neptune/comet/aim logger kinds (configs/logger/* parity) are
    import-gated: absent packages skip with a message instead of raising."""
    from pita_tpu.io.logging import make_logger

    lg = make_logger(str(tmp_path), kinds=("mlflow", "neptune", "comet",
                                           "aim", "csv"))
    lg.log_metrics({"a": 1.0}, step=0)
    out = capsys.readouterr().out
    # at least csv survived; any missing backend announced itself
    assert (tmp_path / "metrics.csv").exists()
    for kind in ("mlflow", "neptune", "comet", "aim"):
        try:
            __import__({"comet": "comet_ml"}.get(kind, kind))
        except ImportError:
            assert f"{kind} not available" in out


def test_sweep_random_search(monkeypatch):
    """--sweep: seeded random search over ranges/choices, minimizing the
    returned metric (hydra-optuna capability, environment.yaml:41)."""
    from pita_tpu import train_cli

    seen = []

    def fake_main(argv):
        seen.append(argv)
        lr = float(next(a.split("=")[1] for a in argv if a.startswith("trainer.lr=")))
        return lr  # pretend the metric equals lr -> best = smallest draw

    monkeypatch.setattr(train_cli, "main", fake_main)
    best = train_cli.sweep(
        ["experiment=gmm", "trainer.lr=1e-4:1e-1",
         "net.hidden_size=32,64", "sweep_trials=5", "sweep_seed=3"]
    )
    assert len(seen) == 5
    t, draw, metric = best
    assert metric == min(
        float(next(a.split("=")[1] for a in argv
                   if a.startswith("trainer.lr="))) for argv in seen
    )
    assert 1e-4 <= draw["trainer.lr"] <= 1e-1
    assert draw["net.hidden_size"] in ("32", "64")
    # fixed args pass through; each trial gets a distinct suffix
    assert all("experiment=gmm" in argv for argv in seen)
    assert len({next(a for a in argv if a.startswith("name_suffix="))
                for argv in seen}) == 5
