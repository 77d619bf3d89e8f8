"""Metric loggers: CSV (always available), console, optional wandb.

Reference parity: the reference's multi-backend logger configs
(``pita/configs/logger/*.yaml`` — wandb default, csv/tensorboard/...) driven by
Lightning's ``log_dict``. Here a tiny common interface: ``log_metrics(dict,
step)`` with pluggable backends; wandb is gated on import availability.
"""

import csv
import os
from typing import Optional


class CSVLogger:
    def __init__(self, out_dir: str, filename: str = "metrics.csv",
                 resume: bool = False):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, filename)
        self._fieldnames = ["step", "launch"]
        self._rows = []
        # a resumed run (fresh process + orbax restore, scripts/run_resumable.sh)
        # must append to the existing history; a fresh run pointed at a reused
        # out_dir must start clean instead of silently merging two histories
        if resume and os.path.exists(self.path):
            try:
                with open(self.path, newline="") as f:
                    reader = csv.DictReader(f)
                    if reader.fieldnames:
                        self._fieldnames = list(reader.fieldnames)
                        if "launch" not in self._fieldnames:
                            self._fieldnames.insert(1, "launch")
                        self._rows = [
                            {k: v for k, v in row.items() if v not in (None, "")}
                            for row in reader
                        ]
            except (OSError, csv.Error):
                pass
        # per-process launch id (VERDICT r4 next #7): a resumed/repeated
        # process appends rows with a NEW id, so duplicated epochs from
        # repeated cold launches can never masquerade as extra progress
        prev = [int(float(r["launch"])) for r in self._rows if r.get("launch")]
        self.launch_id = (max(prev) + 1) if prev else (1 if self._rows else 0)

    def log_metrics(self, metrics: dict, step: int = 0):
        row = {"step": step, "launch": self.launch_id,
               **{k: float(v) for k, v in metrics.items()}}
        self._rows.append(row)
        for k in row:
            if k not in self._fieldnames:
                self._fieldnames.append(k)
        with open(self.path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._fieldnames)
            w.writeheader()
            w.writerows(self._rows)

    def log_image(self, name: str, images, step: int = 0):
        pass  # images are saved by the plotting module directly


class ConsoleLogger:
    def __init__(self, every: int = 1):
        self.every = every

    def log_metrics(self, metrics: dict, step: int = 0):
        if step % self.every == 0:
            parts = " ".join(f"{k}={float(v):.4g}" for k, v in metrics.items())
            print(f"[step {step}] {parts}")

    def log_image(self, name, images, step=0):
        pass


class WandbLogger:
    """Optional; requires the wandb package (absent ⇒ raises at construction)."""

    def __init__(self, project: str, name: Optional[str] = None, config: Optional[dict] = None):
        import wandb

        self._wandb = wandb
        self.run = wandb.init(project=project, name=name, config=config)

    def log_metrics(self, metrics: dict, step: int = 0):
        self._wandb.log(dict(metrics), step=step)

    def log_image(self, name, images, step: int = 0):
        self._wandb.log({name: [self._wandb.Image(im) for im in images]}, step=step)


class TensorBoardLogger:
    """TensorBoard event files via torch.utils.tensorboard (baked-in torch;
    configs/logger/tensorboard.yaml parity)."""

    def __init__(self, out_dir: str):
        from torch.utils.tensorboard import SummaryWriter

        self.writer = SummaryWriter(log_dir=os.path.join(out_dir, "tb"))

    def log_metrics(self, metrics: dict, step: int = 0):
        for k, v in metrics.items():
            self.writer.add_scalar(k, float(v), global_step=step)
        self.writer.flush()

    def log_image(self, name, images, step: int = 0):
        import numpy as np

        for i, im in enumerate(images):
            arr = np.asarray(im)
            if arr.ndim == 3 and arr.shape[-1] in (3, 4):
                self.writer.add_image(
                    f"{name}/{i}", arr[..., :3], global_step=step,
                    dataformats="HWC",
                )


class MLflowLogger:
    """configs/logger/mlflow.yaml parity; requires the mlflow package."""

    def __init__(self, out_dir: str, experiment: str = "pita_tpu"):
        import mlflow

        self._mlflow = mlflow
        mlflow.set_tracking_uri(f"file:{os.path.join(out_dir, 'mlruns')}")
        mlflow.set_experiment(experiment)
        self._run = mlflow.start_run()

    def log_metrics(self, metrics: dict, step: int = 0):
        self._mlflow.log_metrics(
            {k.replace("/", "_"): float(v) for k, v in metrics.items()},
            step=step,
        )

    def log_image(self, name, images, step: int = 0):
        pass


class NeptuneLogger:
    """configs/logger/neptune.yaml parity; requires the neptune package."""

    def __init__(self, project: str = "pita_tpu", **kw):
        import neptune

        self._run = neptune.init_run(project=project, **kw)

    def log_metrics(self, metrics: dict, step: int = 0):
        for k, v in metrics.items():
            self._run[k].append(float(v), step=step)

    def log_image(self, name, images, step: int = 0):
        pass


class CometLogger:
    """configs/logger/comet.yaml parity; requires the comet_ml package."""

    def __init__(self, project: str = "pita_tpu", **kw):
        import comet_ml

        self._exp = comet_ml.Experiment(project_name=project, **kw)

    def log_metrics(self, metrics: dict, step: int = 0):
        self._exp.log_metrics(
            {k: float(v) for k, v in metrics.items()}, step=step
        )

    def log_image(self, name, images, step: int = 0):
        for im in images:
            self._exp.log_image(im, name=name, step=step)


class AimLogger:
    """configs/logger/aim.yaml parity; requires the aim package."""

    def __init__(self, out_dir: str, experiment: str = "pita_tpu"):
        from aim import Run

        self._run = Run(repo=out_dir, experiment=experiment)

    def log_metrics(self, metrics: dict, step: int = 0):
        for k, v in metrics.items():
            self._run.track(float(v), name=k, step=step)

    def log_image(self, name, images, step: int = 0):
        pass


class MultiLogger:
    def __init__(self, loggers):
        self.loggers = list(loggers)

    def log_metrics(self, metrics, step=0):
        for lg in self.loggers:
            lg.log_metrics(metrics, step)

    def log_image(self, name, images, step=0):
        for lg in self.loggers:
            lg.log_image(name, images, step)


def make_logger(out_dir: str, kinds=("csv",), resume: bool = False, **kw):
    """Build a MultiLogger from backend names (configs/logger/* parity)."""
    backends = []
    for kind in kinds:
        if kind == "csv":
            backends.append(CSVLogger(out_dir, resume=resume))
        elif kind == "console":
            backends.append(ConsoleLogger())
        elif kind == "tensorboard":
            try:
                backends.append(TensorBoardLogger(out_dir))
            except ImportError:
                print("tensorboard not available; skipping")
        elif kind == "wandb":
            try:
                backends.append(WandbLogger(**kw))
            except ImportError:
                print("wandb not available; skipping")
        elif kind in ("mlflow", "neptune", "comet", "aim"):
            # reference configs/logger/{mlflow,neptune,comet,aim}.yaml —
            # import-gated like wandb (none are baked into this image)
            cls = {"mlflow": MLflowLogger, "neptune": NeptuneLogger,
                   "comet": CometLogger, "aim": AimLogger}[kind]
            try:
                if kind in ("mlflow", "aim"):
                    backends.append(cls(out_dir, **kw))
                else:
                    backends.append(cls(**kw))
            except ImportError:
                print(f"{kind} not available; skipping")
        else:
            raise ValueError(f"unknown logger kind {kind}")
    return MultiLogger(backends)
