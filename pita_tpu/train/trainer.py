"""EnergyTempTrainer — the temperature-ladder training orchestrator.

Reference parity: ``pita/src/models/energytemp_module.py`` (``energyTempModule``)
plus the Lightning Trainer loop around it (``pita/src/train.py``):

- owns twin score/energy networks (one backbone class, two parameter trees,
  :94-104) with EMA shadows (:109-111),
- a per-rung replay buffer (stacked, §buffer.py) seeded and populated from the
  target train set or the prior (:1229-1247),
- the temperature ladder: active rung from the epoch via the cumulative
  ``num_epochs_per_temp`` schedule (:195-200, :1253-1262),
- training epochs of ``n_train_batches_per_epoch`` buffer batches with SO(3)/
  CoM augmentation (:696-723), the 6-loss objective, Adam + global-norm clip,
  EMA update after every optimizer step (:1297-1302),
- every ``check_val_every_n_epoch`` epochs: evaluation — annealed sample
  generation via the SDE integrator, metrics, and at rung transitions the
  next rung's buffer fill with |E|-masked samples, sample dumps, optional
  network re-initialization (:819-1000),
- test-time final sampling across ladder pairs (:1002-1081).

TPU-first architecture: a *whole epoch* is one jitted ``lax.scan`` over
batches (buffer sampling, augmentation, losses, optimizer and EMA updates all
on device — the reference pays a host dispatch per batch), and sampling is the
single-program integrator from ``pita_tpu.sampler``. Multi-device data/chain
parallelism enters via ``pita_tpu.parallel`` shardings, not a DDP wrapper.
"""

import dataclasses
import os
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pita_tpu.nets.ema import ema_init, ema_update
from pita_tpu.nets.precondition import ScoreWrapper, EnergyWrapper
from pita_tpu.sampler.integrator import IntegratorConfig, integrate_sde
from pita_tpu.targets.priors import Prior
from pita_tpu.train.augment import rotate_augment, com_augment
from pita_tpu.train.buffer import (
    buffer_add,
    buffer_init,
    buffer_sample,
    buffer_set,
    buffer_view,
    stack_buffers,
)
from pita_tpu.train.losses import LossConfig, compute_losses
from pita_tpu.metrics.distances import energy_distances, interatomic_dist_w2
from pita_tpu.metrics.ess import effective_sample_size


def _retry_on_runtime_error(fn, retries: int = 3):
    """Retry a device computation after a transient runtime failure.

    Tunneled TPU runtimes occasionally lose the worker under sustained load;
    the worker restarts transparently, so one retry usually succeeds (the
    reference's crash-safe ``task_wrapper``/eval-exception handling analog,
    utils.py:42-96, energytemp_module.py:765-767)."""
    import jax.errors

    # a restarting tunneled worker can stay unavailable for a minute or two —
    # back off progressively rather than burning all retries in 20 s
    backoff = [10.0, 45.0, 90.0, 180.0]
    for attempt in range(retries + 1):
        try:
            return fn()
        except jax.errors.JaxRuntimeError as e:
            if attempt == retries:
                raise
            wait = backoff[min(attempt, len(backoff) - 1)]
            print(
                f"device runtime error ({e}); retrying in {wait:.0f}s "
                f"({attempt + 1}/{retries})"
            )
            time.sleep(wait)


def fill_with_quality_floor(
    sample_fn,
    integrator_cfg,
    trainer_cfg,
    n_request: int,
    fill_floor=None,
    fill_cfg=None,
    retry=_retry_on_runtime_error,
):
    """Transition buffer fill with the measured-quality floor + escalation.

    ``sample_fn(n_request, fill_cfg) -> (res, res_nores, energies, forces)``
    is the sampling closure (single-device in Trainer.evaluate, mesh-sharded
    in the multichip dryrun — the policy is identical either way).

    Fills run at reference parity first; only a fill whose measured raw ESS
    (from the no-resampling diagnostic pass) is below ``fill_floor`` retries
    with escalated settings — ESS-triggered (adaptive-SMC) resampling + more
    MALA + more chains. The trigger is regime-dependent (oracle collapse
    sweep, docs/transition_fill_study.json): it REGRESSES parity at raw fill
    ESS >= ~0.04 but wins decisively at ~0.01 (occupancy TV 0.32 vs 0.52) —
    and the retry only fires below the floor, i.e. exactly in the regime
    where it wins. The best attempt by effective sample count wins.

    Returns ``((res, res_nores, energies, forces), fill_info, fill_cfg)``
    where ``fill_info`` is {} when no floor is active.
    """
    cfg = trainer_cfg
    fill_attempt, fill_ess_v, best = 0, None, None
    while True:
        out = retry(lambda n=n_request, f=fill_cfg: sample_fn(n, f))
        res, res_nores, energies, forces = out
        if fill_floor is None:
            return out, {}, fill_cfg
        used_cfg = fill_cfg or integrator_cfg
        lw_f = min(
            used_cfg.end_resampling_step, used_cfg.num_integration_steps
        ) - 1
        fill_ess_v = float(
            effective_sample_size(res_nores.logweights[lw_f], normalize=True)
        )
        eff = fill_ess_v * res.samples.shape[0]
        if best is None or eff > best[0]:
            best = (eff, fill_ess_v, out)
        if (
            fill_ess_v >= fill_floor
            or eff >= cfg.transition_fill_effective_floor
            or fill_attempt >= cfg.transition_fill_max_retries
        ):
            break
        fill_attempt += 1
        base_fill = fill_cfg or integrator_cfg
        fill_cfg = base_fill.replace(
            post_mcmc_steps=base_fill.post_mcmc_steps
            + cfg.transition_fill_extra_mcmc,
            ess_resampling_threshold=(
                base_fill.ess_resampling_threshold
                or cfg.transition_ess_threshold
                or 0.3
            ),
        )
        n_request = int(n_request * cfg.transition_fill_chain_multiplier)
        print(
            f"[trainer] transition fill ESS {fill_ess_v:.4f} below floor "
            f"{fill_floor}; retry {fill_attempt} with {n_request} chains, "
            f"{fill_cfg.post_mcmc_steps} MALA steps"
        )
    eff, fill_ess_v, out = best
    fill_info = {
        "fill_ess": fill_ess_v,
        "fill_effective_samples": eff,
        "fill_attempts": float(fill_attempt),
        "fill_below_floor": float(
            fill_ess_v < fill_floor
            and eff < cfg.transition_fill_effective_floor
        ),
    }
    return out, fill_info, fill_cfg


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    """Ladder/loop configuration (configs/model/energytemp.yaml + experiment overlays)."""

    temperatures: tuple = (4.0, 3.0, 2.0, 1.5, 1.2, 1.0)
    num_epochs_per_temp: tuple = (150, 200, 150, 200, 300)
    max_epochs: Optional[int] = None  # default: ladder end
    n_train_batches_per_epoch: int = 250
    training_batch_size: int = 512
    check_val_every_n_epoch: int = 100
    lr: float = 1e-3
    grad_clip: float = 0.5
    # chain-island cap for annealed generation: one integrate dispatch's HBM
    # footprint is bounded by this many chains (None = single dispatch).
    # Large transition fills (e.g. LJ55 5000×1000 steps) OOM a v5e-lite chip
    # with trainer state resident; 1024 also matches the default eval batch
    # so one compiled integrate executable serves evals and islands alike.
    max_chains_per_integrate: Optional[int] = 1024
    ema_decay: float = 0.999
    eval_ema: bool = True
    buffer_capacity: int = 60000
    num_init_samples: int = 10000
    num_eval_samples: int = 2048
    num_temp_annealed_samples: int = 5000
    num_samples_to_save: int = 10000
    test_batch_size: int = 5000
    energy_masking_threshold: float = 1e3
    train_on_all_temps: bool = True
    init_from_prior: bool = False
    reinitialize_networks: bool = False
    prioritize_buffer: bool = False
    # configs/model/energytemp.yaml:37 sets True on the PITA main path (the
    # SimpleBuffer class default is False = without replacement)
    sample_with_replacement: bool = True
    # write the reference's eval diagnostic figures (energytemp_module.py:1083-
    # 1222) under out_dir/plots each evaluation
    make_plots: bool = False
    should_mean_free: bool = True
    precondition_beta: bool = False
    seed: int = 12345
    dem_num_training_epochs: int = 0
    # skip ladder rungs at transitions (energytemp_module.py:833-834)
    skip_temp: bool = False
    num_skip_temps: int = 1
    # Rung-transition fill overrides (LJ55 round-3 post-mortem: per-step
    # resampling at 1024-chain islands collapsed transition-fill ESS to
    # 0.005-0.018, so the colder rungs trained on ~5-18 effective samples
    # and their samples stayed too hot). When set, transition fills run with
    # ESS-triggered (adaptive-SMC) resampling and/or extra MALA refinement
    # instead of exact reference parity — both validated by the bench's
    # two-sided quality gate (hutch_ess mode, docs/bench_r3_measured.json).
    # None = reference-parity transition fills.
    transition_ess_threshold: Optional[float] = None
    transition_post_mcmc_steps: Optional[int] = None
    # Buffer-fill quality floor (VERDICT r3 next #6): a rung transition whose
    # fill has normalized importance-weight ESS below this floor is retried
    # with escalated settings — more chains (× transition_fill_chain_
    # multiplier) and more MALA re-diversification (+ transition_fill_extra_
    # mcmc steps, with adaptive-SMC resampling forced on) — up to
    # transition_fill_max_retries times. The attempt with the highest
    # effective sample count (ESS × chains) fills the buffer either way; a
    # floor violation is recorded in metrics rather than training blindly on
    # a ~5-effective-sample buffer (the LJ55 round-3 failure,
    # energytemp_module.py:1229-1247 buffer-population contract).
    transition_min_fill_ess: Optional[float] = None
    transition_fill_max_retries: int = 2
    transition_fill_chain_multiplier: float = 2.0
    transition_fill_extra_mcmc: int = 30
    # absolute effective-sample-count floor that escalation CAN satisfy:
    # normalized fill ESS measures problem hardness and is ~invariant to
    # chain count, so retries stop once ESS x chains clears this bar (or
    # the ESS floor itself is met, or retries exhaust)
    transition_fill_effective_floor: float = 100.0
    # test-phase annealing pairs in temperature units (al3.yaml
    # temps_to_anneal_test); None = consecutive ladder pairs
    temps_to_anneal_test: Optional[tuple] = None
    # LR schedule over epochs (configs/model/energytemp.yaml lr_scheduler
    # capability): "constant" | "cosine" | "exponential"
    lr_schedule: str = "constant"
    lr_decay_rate: float = 0.99  # per-epoch factor for "exponential"
    lr_min_fraction: float = 0.1  # floor for "cosine"
    # early stopping on an eval metric (configs/callbacks/default.yaml
    # EarlyStopping): None = off
    early_stopping_metric: Optional[str] = None
    early_stopping_patience: int = 3
    early_stopping_min_delta: float = 0.0

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


class EnergyTempTrainer:
    def __init__(
        self,
        target,
        backbone_factory: Callable[[], Any],
        noise_schedule,
        annealing_schedule_factory: Callable[[float], Any],
        loss_cfg: LossConfig,
        integrator_cfg: IntegratorConfig,
        cfg: TrainerConfig,
        out_dir: str = "outputs",
        logger=None,
        dem_cfg=None,
    ):
        if dem_cfg is not None and dem_cfg.num_training_epochs != cfg.dem_num_training_epochs:
            cfg = cfg.replace(dem_num_training_epochs=dem_cfg.num_training_epochs)
        self.cfg = cfg
        self.loss_cfg = loss_cfg
        self.integrator_cfg = integrator_cfg
        self.noise_schedule = noise_schedule
        self.make_annealing = annealing_schedule_factory
        self.out_dir = out_dir
        self.logger = logger
        self.dem_cfg = dem_cfg
        os.makedirs(out_dir, exist_ok=True)

        self.base_target = target
        self.dim = target.dim
        self.n_particles = getattr(target, "n_particles", 1)
        self.n_spatial_dim = getattr(target, "n_spatial_dim", self.dim)
        self.is_molecule = getattr(target, "is_molecule", False)
        self.mean_free = cfg.should_mean_free and self.is_molecule

        temps = np.asarray(cfg.temperatures, dtype=np.float64)
        self.temperatures = temps
        # β_i = round(T_0 / T_i, 2) (energytemp_module.py:180-184)
        self.inverse_temperatures = np.round(temps[0] / temps, 2)
        self.n_temps = len(temps)
        # per-rung targets (energytemp_module.py:1271-1276)
        self.targets = [target.at_temperature(float(T)) for T in temps]

        if cfg.num_epochs_per_temp is not None:
            assert len(cfg.num_epochs_per_temp) == self.n_temps - 1
            self.update_temp_epoch = (
                np.cumsum(cfg.num_epochs_per_temp) + cfg.dem_num_training_epochs
            )
        else:
            assert self.n_temps == 1
            self.update_temp_epoch = np.asarray([], dtype=np.int64)

        self._backbone_factory = backbone_factory
        backbone = backbone_factory()
        self.score = ScoreWrapper(backbone, precondition_beta=cfg.precondition_beta)
        self.energy = EnergyWrapper(backbone_factory(), precondition_beta=cfg.precondition_beta)

        self.key = jax.random.PRNGKey(cfg.seed)
        self.key, k1, k2 = jax.random.split(self.key, 3)
        self.params_score = self.score.init(k1, self.dim)
        # the reference deep-copies one init into both nets (:94-99)
        self.params_energy = jax.tree.map(jnp.copy, self.params_score)
        self.ema_score = ema_init(self.params_score)
        self.ema_energy = ema_init(self.params_energy)

        # LR schedule in optimizer-step units (one epoch =
        # n_train_batches_per_epoch steps); reference attaches a per-epoch
        # torch scheduler via configure_optimizers (models/base.py:26-47)
        total_steps = (
            int(cfg.max_epochs or (np.sum(cfg.num_epochs_per_temp or [100])))
            * cfg.n_train_batches_per_epoch
        )
        if cfg.lr_schedule == "cosine":
            lr = optax.cosine_decay_schedule(
                cfg.lr, total_steps, alpha=cfg.lr_min_fraction
            )
        elif cfg.lr_schedule == "exponential":
            lr = optax.exponential_decay(
                cfg.lr, cfg.n_train_batches_per_epoch, cfg.lr_decay_rate
            )
        else:
            lr = cfg.lr
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adam(lr),
        )
        self.opt_state = self.optimizer.init((self.params_score, self.params_energy))

        self.buffers = stack_buffers(
            [buffer_init(cfg.buffer_capacity, self.dim) for _ in range(self.n_temps)]
        )

        self.epoch = 0
        self._train_epoch_fn = None
        self._dem_epoch_fn = None
        self._integrate_fn_cache = {}
        self.metrics_history = []

    # ---------------------------------------------------------------- setup

    def active_temp_index(self, epoch: Optional[int] = None) -> int:
        """Rung active at ``epoch`` (energytemp_module.py:195-200)."""
        if epoch is None:
            epoch = self.epoch
        return int(np.searchsorted(self.update_temp_epoch, epoch, side="right"))

    @property
    def t_start(self) -> float:
        """Integration start time = times[start_resampling_step] (:192-193)."""
        n = self.integrator_cfg.num_integration_steps
        times = np.linspace(1.0, 0.0, n + 1)
        return float(times[self.integrator_cfg.start_resampling_step])

    def _prior(self, annealing_factor: float):
        gamma_start = self.make_annealing(annealing_factor).gamma(
            jnp.asarray(self.t_start)
        )
        scale = float(
            np.sqrt(self.noise_schedule.h(jnp.asarray(self.t_start)) / gamma_start)
        )
        return Prior(
            scale=scale,
            n_particles=self.n_particles,
            spatial_dim=self.n_spatial_dim,
            dim=self.dim,
            should_mean_free=self.mean_free,
        )

    def populate_initial_buffer(self):
        """Fill rung-0 buffer from train data or the prior (:1229-1247)."""
        self.key, k_data, k_prior = jax.random.split(self.key, 3)
        if self.cfg.init_from_prior or self.cfg.dem_num_training_epochs > 0:
            prior = Prior(
                scale=float(np.sqrt(self.noise_schedule.h(jnp.asarray(self.t_start)))),
                n_particles=self.n_particles,
                spatial_dim=self.n_spatial_dim,
                dim=self.dim,
                should_mean_free=self.mean_free,
            )
            init_states = prior.sample(k_prior, self.cfg.num_init_samples)
        else:
            init_states = self.targets[0].sample_train_set(k_data, self.cfg.num_init_samples)
        energies, forces = self.targets[0].log_prob_and_force(init_states)
        buf0 = buffer_add(buffer_view(self.buffers, 0), init_states, energies, forces)
        self.buffers = buffer_set(self.buffers, 0, buf0)

    # ------------------------------------------------------------ train step

    def _build_train_epoch(self):
        cfg = self.cfg
        score, energy = self.score, self.energy
        noise_schedule, loss_cfg = self.noise_schedule, self.loss_cfg
        optimizer = self.optimizer
        n_p, n_d = self.n_particles, self.n_spatial_dim
        is_mol, mean_free = self.is_molecule, self.mean_free
        inv_temps = jnp.asarray(self.inverse_temperatures, jnp.float32)
        batch = cfg.training_batch_size
        n_batches = cfg.n_train_batches_per_epoch

        def train_epoch(params_s, params_e, opt_state, ema_s, ema_e, buffers, key, temp_idxs):
            def one_step(carry, inp):
                params_s, params_e, opt_state, ema_s, ema_e = carry
                key_t, temp_idx = inp
                k_sample, k_aug, k_com, k_loss = jax.random.split(key_t, 4)
                buf_i = buffer_view(buffers, temp_idx)
                x0, e0, f0, _ = buffer_sample(
                    buf_i, k_sample, batch,
                    prioritize=cfg.prioritize_buffer,
                    replacement=cfg.sample_with_replacement,
                )
                if is_mol:
                    x0, f0 = rotate_augment(k_aug, x0, f0, n_p, n_d)
                if is_mol and not mean_free:
                    x0 = com_augment(k_com, x0, n_p, n_d)
                beta = inv_temps[temp_idx]
                t_i = self._epoch_targets_switch(temp_idx)

                def loss_fn(both):
                    ps, pe = both
                    return compute_losses(
                        score, energy, ps, pe, noise_schedule, loss_cfg, k_loss,
                        x0, e0, f0, beta,
                        target=t_i, n_particles=n_p, n_spatial_dim=n_d,
                        mean_free=mean_free,
                    )

                (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    (params_s, params_e)
                )
                updates, opt_state = optimizer.update(
                    grads, opt_state, (params_s, params_e)
                )
                params_s, params_e = optax.apply_updates((params_s, params_e), updates)
                if cfg.ema_decay > 0:
                    ema_s = ema_update(ema_s, params_s, cfg.ema_decay)
                    ema_e = ema_update(ema_e, params_e, cfg.ema_decay)
                scalar_aux = {
                    k: v
                    for k, v in aux.items()
                    if not k.endswith("per_sample") and k != "ln_sigma"
                }
                return (params_s, params_e, opt_state, ema_s, ema_e), scalar_aux

            keys = jax.random.split(key, n_batches)
            carry = (params_s, params_e, opt_state, ema_s, ema_e)
            carry, aux = jax.lax.scan(one_step, carry, (keys, temp_idxs))
            mean_aux = jax.tree.map(jnp.mean, aux)
            return carry, mean_aux

        return train_epoch

    def _epoch_targets_switch(self, temp_idx):
        """Static dispatch: losses that need the target (dem_energy) pick the
        active rung's target. With the default weights (dem_energy=0) the
        target is unused and any rung works; when enabled, fall back to
        branch-per-rung lax.switch only if tempered targets differ."""
        if self.loss_cfg.w_dem_energy == 0:
            return self.targets[0]
        # all rungs share the same functional form; temperature enters log_prob
        # as a scalar divide — build a switch-free tempered wrapper
        base = self.targets[0]
        temps = jnp.asarray(self.temperatures, jnp.float32)

        class _TemperedView:
            def __init__(self, base, T):
                self._base = base
                self._T = T

            def log_prob(self, x):
                return self._base.log_prob(x) * self._base.temperature / self._T

        return _TemperedView(base, temps[temp_idx])

    def train_one_epoch(self) -> dict:
        """Run one epoch of buffer-batch training, fully on device."""
        if self._train_epoch_fn is None:
            self._train_epoch_fn = jax.jit(self._build_train_epoch())
        cfg = self.cfg
        self.key, k_epoch, k_temps = jax.random.split(self.key, 3)
        active = self.active_temp_index()
        if cfg.train_on_all_temps:
            # uniform over active rungs, per batch (:703-710)
            temp_idxs = jax.random.randint(
                k_temps, (cfg.n_train_batches_per_epoch,), 0, active + 1
            )
        else:
            temp_idxs = jnp.full((cfg.n_train_batches_per_epoch,), active, jnp.int32)
        (
            (self.params_score, self.params_energy, self.opt_state,
             self.ema_score, self.ema_energy),
            aux,
        ) = self._train_epoch_fn(
            self.params_score, self.params_energy, self.opt_state,
            self.ema_score, self.ema_energy, self.buffers, k_epoch, temp_idxs,
        )
        return {k: float(v) for k, v in aux.items()}

    # -------------------------------------------------------- DEM pretraining

    def _build_dem_epoch(self):
        from pita_tpu.train.dem import pretrain_loss

        cfg, dem = self.cfg, self.dem_cfg
        score = self.score
        optimizer = self.optimizer
        n_p, n_d = self.n_particles, self.n_spatial_dim
        is_mol, mean_free = self.is_molecule, self.mean_free
        beta0 = float(self.inverse_temperatures[0])
        target0 = self.targets[0]
        n_batches = cfg.n_train_batches_per_epoch

        def dem_epoch(params_s, params_e, opt_state, ema_s, ema_e, buffers, key):
            def one_step(carry, key_t):
                params_s, params_e, opt_state, ema_s, ema_e = carry
                k_sample, k_aug, k_loss = jax.random.split(key_t, 3)
                buf0 = buffer_view(buffers, 0)
                x0, _, f0, _ = buffer_sample(
                    buf0, k_sample, dem.training_batch_size,
                    replacement=cfg.sample_with_replacement,
                )
                if is_mol:
                    x0, f0 = rotate_augment(k_aug, x0, f0, n_p, n_d)

                def loss_fn(ps):
                    return pretrain_loss(
                        score, ps, dem, k_loss, x0, f0, beta0,
                        target=target0, n_particles=n_p, n_spatial_dim=n_d,
                        mean_free=mean_free,
                    )

                loss, g_s = jax.value_and_grad(loss_fn)(params_s)
                grads = (g_s, jax.tree.map(jnp.zeros_like, params_e))
                updates, opt_state = optimizer.update(
                    grads, opt_state, (params_s, params_e)
                )
                params_s, params_e = optax.apply_updates((params_s, params_e), updates)
                if cfg.ema_decay > 0:
                    ema_s = ema_update(ema_s, params_s, cfg.ema_decay)
                    ema_e = ema_update(ema_e, params_e, cfg.ema_decay)
                return (params_s, params_e, opt_state, ema_s, ema_e), loss

            keys = jax.random.split(key, n_batches)
            carry = (params_s, params_e, opt_state, ema_s, ema_e)
            carry, losses = jax.lax.scan(one_step, carry, keys)
            return carry, jnp.mean(losses)

        return dem_epoch

    def dem_train_one_epoch(self) -> dict:
        """One DEM pretraining epoch (energytemp_module.py:696-701)."""
        if self._dem_epoch_fn is None:
            self._dem_epoch_fn = jax.jit(self._build_dem_epoch())
        self.key, k = jax.random.split(self.key)
        (
            (self.params_score, self.params_energy, self.opt_state,
             self.ema_score, self.ema_energy),
            loss,
        ) = self._dem_epoch_fn(
            self.params_score, self.params_energy, self.opt_state,
            self.ema_score, self.ema_energy, self.buffers, k,
        )
        return {"pretrain_target_score_loss": float(loss)}

    def eval_epoch_end_dem(self, prefix: str = "val") -> dict:
        """Plain reverse-SDE sampling to refill buffer 0 (:769-800)."""
        dem = self.dem_cfg
        target0 = self.targets[0]
        cfg_dem = self.integrator_cfg.replace(
            num_integration_steps=dem.num_integration_steps,
            debias_inference=False,
            resampling_interval=-1,
            resample_at_end=False,
            start_resampling_step=0,
            end_resampling_step=dem.num_integration_steps,
        )
        res = self.generate_samples(
            target0,
            dem.num_samples_to_generate_per_epoch,
            inverse_temp=float(self.inverse_temperatures[0]),
            annealing_factor=1.0,
            integrator_cfg=cfg_dem,
        )
        samples = res.samples
        energies, forces = target0.log_prob_and_force(samples)
        buf0 = buffer_add(buffer_view(self.buffers, 0), samples, energies, forces)
        self.buffers = buffer_set(self.buffers, 0, buf0)
        metrics = {f"{prefix}/dem/energy_mean": float(-jnp.mean(energies))}
        self.key, k_val = jax.random.split(self.key)
        try:
            data = target0.sample_val_set(k_val, samples.shape[0])
        except (ValueError, NotImplementedError):
            data = None
        if data is not None:
            metrics.update(
                energy_distances(
                    energies, target0.log_prob(data), prefix=f"{prefix}/dem",
                    energy_threshold=self.cfg.energy_masking_threshold,
                )
            )
            if self.is_molecule:
                metrics[f"{prefix}/dem/dist_w2"] = interatomic_dist_w2(
                    target0, samples, data
                )
        if self.logger is not None:
            self.logger.log_metrics(metrics, step=self.epoch)
        self.metrics_history.append(dict(metrics, epoch=self.epoch))
        return metrics

    # -------------------------------------------------------------- sampling

    def _eval_params(self):
        """EMA-swapped parameters for evaluation (:803-813)."""
        if self.cfg.ema_decay > 0 and self.cfg.eval_ema:
            return self.ema_score.params, self.ema_energy.params
        return self.params_score, self.params_energy

    def generate_samples(
        self,
        target,
        num_samples: int,
        inverse_temp: float = 1.0,
        annealing_factor: float = 1.0,
        annealing_factor_score: Optional[float] = None,
        resampling_interval: Optional[int] = None,
        return_logweights: bool = False,
        integrator_cfg: Optional[IntegratorConfig] = None,
        params: Optional[tuple] = None,
    ):
        """Annealed sample generation (energytemp_module.py:237-298).

        ``annealing_factor_score`` is accepted for API parity but has no
        effect: the reference ties gamma_score to gamma_energy inside the
        drift (sdes.py:142-143), making the separate score factor dead code —
        we implement the tied form directly.
        """
        del annealing_factor_score
        cfg = integrator_cfg or self.integrator_cfg
        anneal = self.make_annealing(annealing_factor)
        prior = self._prior(annealing_factor)
        ps, pe = params if params is not None else self._eval_params()

        cap = self.cfg.max_chains_per_integrate
        if cap is not None and num_samples > cap:
            # bounded-memory generation: integrate in equal chain islands
            # (per-island systematic resampling — a valid SMC island
            # estimator; the HBM cost of one dispatch is bounded by `cap`).
            # Diagnostic trajectories come from the first island.
            n_islands = -(-num_samples // cap)
            parts, lw_parts, acc_parts, nuniq_parts = [], [], [], []
            first = None
            for i in range(n_islands):
                n_i = min(cap, num_samples - i * cap)
                self.key, k_prior, k_int = jax.random.split(self.key, 3)
                x1 = prior.sample(k_prior, cap)  # equal sizes: one compile
                res_i = self._integrate(
                    k_int, x1, ps, pe, anneal, target, inverse_temp, cfg,
                    resampling_interval,
                )
                if first is None:
                    first = res_i
                parts.append(np.asarray(res_i.samples)[:n_i])
                lw_parts.append(np.asarray(res_i.logweights)[:, :n_i])
                acc_parts.append(np.asarray(res_i.acceptance_rates))
                nuniq_parts.append(np.asarray(res_i.num_unique))
            # diagnostics aggregated across islands so a consumer never pairs
            # full-size samples with first-island-only weights (per-island
            # systematic resampling remains the estimator; recorded below)
            res = first._replace(
                samples=jnp.asarray(np.concatenate(parts)),
                logweights=jnp.asarray(np.concatenate(lw_parts, axis=1)),
                acceptance_rates=jnp.asarray(np.mean(acc_parts, axis=0)),
                num_unique=jnp.asarray(np.sum(nuniq_parts, axis=0)),
            )
            self._last_n_islands = n_islands
        else:
            self.key, k_prior, k_int = jax.random.split(self.key, 3)
            x1 = prior.sample(k_prior, num_samples)
            res = self._integrate(
                k_int, x1, ps, pe, anneal, target, inverse_temp, cfg,
                resampling_interval,
            )
            self._last_n_islands = 1
        if not return_logweights:
            return res
        # second pass without resampling for log-weight diagnostics (:279-296)
        self.key, k2 = jax.random.split(self.key)
        n_diag = min(num_samples, 512)
        res_nores = self._integrate(
            k2, x1[:n_diag], ps, pe, anneal, target, inverse_temp, cfg,
            cfg.num_integration_steps + 1,
        )
        return res, res_nores

    def _integrate(self, key, x1, ps, pe, anneal, target, beta, cfg, resampling_interval):
        if cfg.segment_size is not None:
            # segmented mode manages its own per-segment jit (an outer jit
            # would re-inline the host loop into one huge program)
            return integrate_sde(
                key, x1, self.score, self.energy, ps, pe,
                self.noise_schedule, anneal, target,
                jnp.asarray(beta, jnp.float32), cfg,
                resampling_interval=resampling_interval,
            )
        from pita_tpu.sampler.integrator import _weak_key

        cache_key = (_weak_key(target), anneal, cfg, resampling_interval, x1.shape)
        if cache_key not in self._integrate_fn_cache:
            def fn(key, x1, ps, pe, beta):
                return integrate_sde(
                    key, x1, self.score, self.energy, ps, pe,
                    self.noise_schedule, anneal, target, beta, cfg,
                    resampling_interval=resampling_interval,
                )
            self._integrate_fn_cache[cache_key] = jax.jit(fn)
        return self._integrate_fn_cache[cache_key](
            key, x1, ps, pe, jnp.asarray(beta, jnp.float32)
        )

    def prewarm_eval_compiles(self, include_transitions: bool = True) -> dict:
        """AOT-compile the integrate programs the coming evals will need.

        The ALDP epoch-0 val-eval integrate compile measured >5.5 min on the
        tunneled chip (NOTES round 4) — longer than some sessions' whole
        window, which forced round-4 ALDP to run train-only. Running this in
        a sacrificial process *before* the training window fills the
        persistent compilation cache (``JAX_COMPILATION_CACHE_DIR``), so the
        training process's first eval hits warm cache; a wedged or killed
        compile costs only the sacrificial process. (VERDICT r4 next #2a.)

        Compiles, per rung transition from the active rung down (plus the
        plain val eval at the active rung): the segmented integrate program at
        the island chain count and the 512-chain no-resampling diagnostic
        shape, then executes one tiny-cost MALA refinement at the same shapes
        so the post-processing executables (eager scan programs) are cached
        too. Returns {label: seconds}.
        """
        cfg = self.cfg
        cap = cfg.max_chains_per_integrate
        timings = {}
        deadline = None
        budget = os.environ.get("PITA_PREWARM_BUDGET_S")
        if budget:
            deadline = time.time() + float(budget)

        def islands_chain_count(n_request):
            return min(n_request, cap) if cap else n_request

        # chronological order — a deadline-truncated prewarm still covers the
        # programs the run needs FIRST (plain val at the active rung, then
        # that rung's transition fill, then the next rung, ...)
        idx = self.active_temp_index()
        combos = []
        for i in range(idx, self.n_temps):
            beta_i = float(self.inverse_temperatures[i])
            combos.append((
                f"val@T={self.temperatures[i]:g}", self.targets[i], 1.0,
                beta_i, islands_chain_count(cfg.num_eval_samples),
            ))
            combos.append((
                f"val_diag@T={self.temperatures[i]:g}", self.targets[i], 1.0,
                beta_i, min(cfg.num_eval_samples, 512),
            ))
            if not include_transitions or i >= self.n_temps - 1:
                continue
            lo = i + 1
            if cfg.skip_temp:
                lo = min(lo + cfg.num_skip_temps, self.n_temps - 1)
            af = float(self.inverse_temperatures[lo] / self.inverse_temperatures[i])
            for tag, B in (
                ("fill", islands_chain_count(cfg.num_temp_annealed_samples)),
                ("fill_diag", min(cfg.num_temp_annealed_samples, 512)),
            ):
                combos.append((
                    f"{tag}@T={self.temperatures[i]:g}->"
                    f"{self.temperatures[lo]:g}",
                    self.targets[lo], af, beta_i, B,
                ))

        ps, pe = self._eval_params()
        icfg = self.integrator_cfg
        segmented = (
            icfg.segment_size is not None
            and icfg.segment_size < icfg.num_integration_steps
        )
        for label, target, af, beta, B in combos:
            if deadline is not None and time.time() > deadline:
                print(f"[prewarm] budget exhausted before {label}; stopping")
                timings["truncated_at"] = label
                break
            anneal = self.make_annealing(af)
            x1 = jnp.zeros((B, self.dim), jnp.float32)
            key = jax.random.PRNGKey(0)
            t0 = time.perf_counter()
            if segmented:
                integrate_sde(
                    key, x1, self.score, self.energy, ps, pe,
                    self.noise_schedule, anneal, target,
                    jnp.asarray(beta, jnp.float32), icfg, compile_only=True,
                )
            else:
                # mirror _integrate's jit so the in-process cache (and the
                # persistent cache) hold the exact executable evaluate() asks for
                def fn(key, x1, ps, pe, beta, anneal=anneal, target=target):
                    return integrate_sde(
                        key, x1, self.score, self.energy, ps, pe,
                        self.noise_schedule, anneal, target, beta, icfg,
                    )
                jax.jit(fn).lower(
                    key, x1, ps, pe, jnp.asarray(beta, jnp.float32)
                ).compile()
            timings[label] = round(time.perf_counter() - t0, 1)
            print(f"[prewarm] {label} (B={B}): {timings[label]}s", flush=True)
            if segmented and icfg.post_mcmc_steps > 0:
                # post-processing runs outside the segment jit; one real call
                # at the eval shape caches its (cheap) executables too
                from pita_tpu.sampler.integrator import mala

                t0 = time.perf_counter()
                xw = jax.random.normal(key, (B, self.dim), jnp.float32) * 0.1
                _, acc = mala(
                    key, xw, target, num_steps=icfg.post_mcmc_steps,
                    dt_init=icfg.dt_negative_time,
                    adaptive=icfg.adaptive_mcmc,
                    mean_free=icfg.should_mean_free
                    and getattr(target, "is_molecule", False),
                )
                jax.block_until_ready(acc)
                timings[label + "/mala"] = round(time.perf_counter() - t0, 1)
        return timings

    # ------------------------------------------------------------ evaluation

    def eval_step_losses(self, prefix: str = "val") -> dict:
        """Model losses on true val/test data (energytemp_module.py:734-767)."""
        index = self.active_temp_index()
        target = self.targets[index]
        self.key, k_data, k_loss = jax.random.split(self.key, 3)
        num = min(self.cfg.num_eval_samples, self.cfg.training_batch_size)
        try:
            if prefix.startswith("test"):
                x0 = target.sample_test_set(k_data, num)
            else:
                x0 = target.sample_val_set(k_data, num)
        except (ValueError, NotImplementedError):
            return {}
        e0, f0 = target.log_prob_and_force(x0)
        beta = jnp.asarray(self.inverse_temperatures[index], jnp.float32)
        total, aux = compute_losses(
            self.score, self.energy, self.params_score, self.params_energy,
            self.noise_schedule, self.loss_cfg, k_loss, x0, e0, f0, beta,
            target=target, n_particles=self.n_particles,
            n_spatial_dim=self.n_spatial_dim, mean_free=self.mean_free,
        )
        T = self.temperatures[index]
        out = {
            f"{prefix}/temp={T:.3f}/{k}": float(v)
            for k, v in aux.items()
            if not k.endswith("per_sample") and k != "ln_sigma"
        }
        out[f"{prefix}/loss"] = float(total)
        # ln-sigma-stratified loss diagnostics (energytemp_module.py:300-321,
        # logsigma_stratified_loss — binned on the schedule's edges)
        from pita_tpu.train.losses import stratified_losses

        edges = self.noise_schedule.ln_sigma_bins(4)
        for lname in ("score_loss", "energy_score_loss"):
            strat = stratified_losses(
                aux["ln_sigma"], aux[f"{lname}_per_sample"], edges, loss_name=lname
            )
            out.update({f"{prefix}/temp={T:.3f}/{k}": float(v) for k, v in strat.items()})
        if self.logger is not None:
            self.logger.log_metrics(out, step=self.epoch)
        return out

    def evaluate(self, prefix: str = "val") -> dict:
        """Validation-epoch evaluation + rung transition (:819-1000)."""
        cfg = self.cfg
        index = self.active_temp_index()
        index_lower = index
        num_samples = cfg.num_eval_samples
        anneal_to_lower = (
            index < self.n_temps - 1
            and len(self.update_temp_epoch) > 0
            and (self.epoch + 1) == self.update_temp_epoch[index]
        )
        if anneal_to_lower:
            num_samples = cfg.num_temp_annealed_samples
            index_lower += 1
            if cfg.skip_temp:
                index_lower = min(index_lower + cfg.num_skip_temps, self.n_temps - 1)
            # rung transitions compile a NEW annealed-integrate executable; on
            # small-HBM chips the accumulated executables from the training
            # rung leave no room for it (observed: RESOURCE_EXHAUSTED at the
            # prior). Transitions are rare — drop every cached executable and
            # let the persistent compilation cache reload what is still needed.
            self._integrate_fn_cache.clear()
            from pita_tpu.sampler.integrator import _SEGMENT_CACHE

            _SEGMENT_CACHE.clear()
            jax.clear_caches()

        inverse_temp = float(self.inverse_temperatures[index])
        inverse_lower = float(self.inverse_temperatures[index_lower])
        annealing_factor = inverse_lower / inverse_temp
        target_lower = self.targets[index_lower]

        # transition fills may deviate from reference parity (see the
        # transition_* TrainerConfig fields): the next rung trains on this
        # buffer, so fill quality dominates — ESS-triggered resampling stops
        # per-step selection from collapsing the island populations, and
        # extra MALA steps re-diversify the survivors at the new temperature
        fill_cfg = None
        if anneal_to_lower:
            repl = {}
            if cfg.transition_ess_threshold is not None:
                repl["ess_resampling_threshold"] = cfg.transition_ess_threshold
            if cfg.transition_post_mcmc_steps is not None:
                repl["post_mcmc_steps"] = cfg.transition_post_mcmc_steps
            if repl:
                fill_cfg = dataclasses.replace(self.integrator_cfg, **repl)

        def _sample_and_energies(n_request, f_cfg):
            # sampling AND the downstream energy/force evaluation retry as
            # one unit: after a tunneled-worker restart the sampled device
            # buffers are gone, so retrying only the energy call cannot work
            res, res_nores = self.generate_samples(
                target_lower,
                n_request,
                inverse_temp=inverse_temp,
                annealing_factor=annealing_factor,
                return_logweights=True,
                integrator_cfg=f_cfg,
            )
            energies, forces = target_lower.log_prob_and_force(res.samples)
            jax.block_until_ready(energies)
            return res, res_nores, energies, forces

        # buffer-fill quality floor: refuse a collapsed transition fill and
        # retry with escalated settings (see TrainerConfig.transition_min_
        # fill_ess); the best attempt by effective sample count wins. The
        # loop itself is the module-level fill_with_quality_floor so the
        # sharded sampler exercises the identical policy (SURVEY §2.9 — the
        # multichip dryrun drives it over an 8-device mesh).
        fill_floor = cfg.transition_min_fill_ess if anneal_to_lower else None
        (res, res_nores, energies, forces), fill_info, fill_cfg = (
            fill_with_quality_floor(
                _sample_and_energies,
                self.integrator_cfg,
                cfg,
                num_samples,
                fill_floor=fill_floor,
                fill_cfg=fill_cfg,
            )
        )
        metrics = {}
        if fill_info:
            metrics.update(
                {f"{prefix}/{k}": v for k, v in fill_info.items()}
            )
        samples = res.samples
        if anneal_to_lower:
            # |E| mask then fill the next rung's buffer (:881-901)
            mask = jnp.abs(energies) <= cfg.energy_masking_threshold
            if bool(jnp.sum(mask) == 0):
                mask = jnp.ones_like(mask)
            buf = buffer_view(self.buffers, index_lower)
            buf = buffer_add(buf, samples, energies, forces, mask=mask)
            self.buffers = buffer_set(self.buffers, index_lower, buf)
            np.savez(
                os.path.join(
                    self.out_dir,
                    f"buffer_samples_temperature_{self.temperatures[index_lower]:.3f}.npz",
                ),
                samples=np.asarray(samples),
                energies=np.asarray(energies),
                samples_not_resampled=np.asarray(res_nores.samples),
            )
            if cfg.reinitialize_networks and not cfg.train_on_all_temps:
                self._reinitialize_networks()
            metrics[f"{prefix}/buffer_filled_temp"] = float(
                self.temperatures[index_lower]
            )
            if fill_cfg is not None:
                # record the non-parity fill semantics next to the artifact
                metrics[f"{prefix}/transition_ess_threshold"] = float(
                    cfg.transition_ess_threshold or -1.0
                )
                metrics[f"{prefix}/transition_post_mcmc_steps"] = float(
                    fill_cfg.post_mcmc_steps
                )

        # metrics (:929-999)
        self.key, k_val = jax.random.split(self.key)
        try:
            data = target_lower.sample_val_set(k_val, samples.shape[0])
        except (ValueError, NotImplementedError):
            data = None
        if data is not None:
            data_energies = target_lower.log_prob(data)
            metrics.update(
                energy_distances(
                    energies, data_energies, prefix=prefix,
                    energy_threshold=cfg.energy_masking_threshold,
                )
            )
            # scale anchor for the W2 numbers (VERDICT r2: a W2 without the
            # energy distribution's spread is uninterpretable)
            metrics[f"{prefix}/data_energy_std"] = float(jnp.std(data_energies))
            if self.is_molecule:
                metrics[f"{prefix}/dist_w2"] = interatomic_dist_w2(
                    target_lower, samples, data
                )
        if data is not None:
            # target-specific eval hook: Ramachandran/torus-W/chirality/TICA
            # for peptides, contours for GMM (energytemp_module.py:954 →
            # alp_energy.py:190-291)
            metrics.update(
                target_lower.log_on_epoch_end(
                    samples, data, prefix=prefix,
                    out_dir=os.path.join(
                        self.out_dir, "plots", f"epoch_{self.epoch}"
                    ),
                    samples_not_resampled=res_nores.samples,
                    make_plots=cfg.make_plots,
                )
            )
        metrics[f"{prefix}/energy_mean"] = float(-jnp.mean(energies))
        metrics[f"{prefix}/energy_mean_no_resampling"] = float(
            -jnp.mean(target_lower.log_prob(res_nores.samples))
        )
        metrics[f"{prefix}/lower_temp"] = float(self.temperatures[index_lower])
        # read the log-weights at the end of the accumulation window — past
        # end_resampling_step they are zeroed (sde_integration.py:281-282)
        lw_step = min(
            self.integrator_cfg.end_resampling_step,
            self.integrator_cfg.num_integration_steps,
        ) - 1
        final_lw = res_nores.logweights[lw_step]
        metrics[f"{prefix}/ess"] = float(effective_sample_size(final_lw, normalize=True))
        metrics[f"{prefix}/logweight_std"] = float(jnp.std(final_lw))
        # resampling semantics that produced this artifact (VERDICT r2 weak
        # #9): 1 = global systematic resample (reference parity,
        # sde_integration.py:292-296); >1 = per-island resample (chain-island
        # generation under max_chains_per_integrate — a valid SMC island
        # estimator with different variance)
        metrics[f"{prefix}/n_resampling_islands"] = float(
            getattr(self, "_last_n_islands", 1)
        )
        if res.acceptance_rates.shape[0] > 0:
            metrics[f"{prefix}/acceptance_rate_mean"] = float(
                jnp.mean(res.acceptance_rates)
            )
        if self.logger is not None:
            self.logger.log_metrics(metrics, step=self.epoch)
        self.metrics_history.append(dict(metrics, epoch=self.epoch))
        if self.cfg.make_plots:
            self._make_eval_plots(res, res_nores, target_lower, samples, energies, data)
        return metrics

    def _make_eval_plots(self, res, res_nores, target, samples, energies, data):
        """Reference evaluation figures (§5.5) saved under out_dir/plots."""
        from pita_tpu.io import plotting as P

        pdir = os.path.join(self.out_dir, "plots", f"epoch_{self.epoch}")
        if data is not None:
            P.plot_energy_histograms(
                energies,
                target.log_prob(data),
                pdir,
                not_resampled_energies=target.log_prob(res_nores.samples),
            )
            if self.is_molecule:
                P.plot_interatomic_distances(target, samples, data, pdir)
        if getattr(target, "name", "") == "gmm":
            P.plot_gmm_contours(target, samples, pdir)
        if hasattr(target, "dihedrals"):
            phi, psi = target.dihedrals(samples)
            P.plot_ramachandran(phi, psi, pdir, temperature=target.temperature)
        P.plot_logweights(res_nores.logweights, pdir)
        P.plot_num_unique(res.num_unique, pdir)
        P.plot_acceptance(res.acceptance_rates, pdir)
        P.plot_sde_term_stats(res.term_stats, pdir)

    def _reinitialize_networks(self):
        """Fresh backbone params at a rung transition (:913-920)."""
        self.key, k = jax.random.split(self.key)
        self.params_score = self.score.init(k, self.dim)
        self.params_energy = jax.tree.map(jnp.copy, self.params_score)
        self.ema_score = ema_init(self.params_score)
        self.ema_energy = ema_init(self.params_energy)
        self.opt_state = self.optimizer.init((self.params_score, self.params_energy))

    # ------------------------------------------------------------------ fit

    def fit(
        self,
        max_epochs: Optional[int] = None,
        log_every: int = 10,
        ckpt_path: Optional[str] = None,
        resume: bool = False,
        time_checkpoint_seconds: Optional[float] = None,
    ):
        """The training loop (train.py:106 + Lightning epoch loop).

        ``ckpt_path`` + ``resume=True`` restores and continues (extras/
        resumable.yaml capability); the checkpoint is refreshed at every
        validation epoch and optionally on a wall-clock interval
        (configs/callbacks/time_checkpoint.yaml).
        """
        from pita_tpu.io.checkpoint import (
            TimeIntervalCheckpointer,
            restore_checkpoint,
            save_checkpoint,
        )

        cfg = self.cfg
        if max_epochs is None:
            max_epochs = cfg.max_epochs or (
                int(self.update_temp_epoch[-1]) if len(self.update_temp_epoch) else 100
            )
        if ckpt_path and resume:
            restore_checkpoint(self, ckpt_path)
        if int(self.buffers.size[0]) == 0:
            self.populate_initial_buffer()
        timer = (
            TimeIntervalCheckpointer(self, ckpt_path, time_checkpoint_seconds)
            if ckpt_path and time_checkpoint_seconds
            else None
        )
        dem_epochs = cfg.dem_num_training_epochs
        best_metric, stall = np.inf, 0
        while self.epoch < max_epochs:
            t0 = time.time()
            in_dem_phase = self.dem_cfg is not None and self.epoch < dem_epochs
            aux = self.dem_train_one_epoch() if in_dem_phase else self.train_one_epoch()
            dt = time.time() - t0
            if self.logger is not None and (self.epoch % log_every == 0):
                self.logger.log_metrics(
                    {f"train/{k}": v for k, v in aux.items()} | {"train/epoch_s": dt},
                    step=self.epoch,
                )
            if in_dem_phase:
                # DEM eval/refill cadence (energytemp_module.py:725-732)
                if (
                    self.epoch % self.dem_cfg.check_val_every_n_epochs == 0
                    and self.epoch > 0
                ):
                    self.eval_epoch_end_dem("val")
            elif (
                (self.epoch + 1) % cfg.check_val_every_n_epoch == 0
                # ALWAYS evaluate at rung-transition epochs: the transition
                # (next rung's buffer fill, energytemp_module.py:881-901) runs
                # inside evaluate(); with the reference's shipped configs the
                # transition epochs (cumsum 150/350/…) never align with the
                # val-every-100 cadence, leaving the next rung's buffer empty
                # — a latent reference bug we do not replicate
                or (self.epoch + 1) in self.update_temp_epoch
            ):
                self.eval_step_losses("val")
                val_metrics = self.evaluate("val")
                if ckpt_path:
                    save_checkpoint(self, ckpt_path)
                if cfg.early_stopping_metric is not None:
                    # EarlyStopping callback parity (min mode, patience in
                    # validation epochs; configs/callbacks/default.yaml)
                    cur = val_metrics.get(cfg.early_stopping_metric, np.inf)
                    if cur < best_metric - cfg.early_stopping_min_delta:
                        best_metric, stall = cur, 0
                    else:
                        stall += 1
                        if stall >= cfg.early_stopping_patience:
                            print(
                                f"early stopping at epoch {self.epoch}: "
                                f"{cfg.early_stopping_metric} stalled at "
                                f"{best_metric:.4g} for {stall} evals"
                            )
                            break
            if timer is not None:
                timer.maybe_save()
            self.epoch += 1
        if ckpt_path:
            save_checkpoint(self, ckpt_path)
        return self.metrics_history

    # ----------------------------------------------------------------- test

    def test(self, temps_to_anneal=None, ckpt_path: Optional[str] = None) -> dict:
        """Final sampling across ladder pairs (:1002-1081).

        ``ckpt_path`` reloads the checkpoint before test-phase sampling —
        the reference tests from ``ckpt_path="best"`` (train.py:110-119), so
        a resumed or multi-phase run tests the *saved* params, not whatever
        happens to be in memory.
        """
        cfg = self.cfg
        if ckpt_path:
            from pita_tpu.io.checkpoint import restore_checkpoint

            restore_checkpoint(self, ckpt_path)
        if temps_to_anneal is None:
            temps_to_anneal = cfg.temps_to_anneal_test
        if temps_to_anneal is None:
            pairs = [(i, i + 1) for i in range(self.n_temps - 1)]
        else:
            pairs = []
            for Ta, Tb in temps_to_anneal:
                ia = int(np.argmin(np.abs(self.temperatures - Ta)))
                ib = int(np.argmin(np.abs(self.temperatures - Tb)))
                pairs.append((ia, ib))
        all_metrics = {}
        for i, j in pairs:
            beta_i = float(self.inverse_temperatures[i])
            beta_j = float(self.inverse_temperatures[j])
            res = _retry_on_runtime_error(
                lambda: self.generate_samples(
                    self.targets[j],
                    cfg.num_samples_to_save,
                    inverse_temp=beta_i,
                    annealing_factor=beta_j / beta_i,
                )
            )
            samples = np.asarray(res.samples)
            path = os.path.join(
                self.out_dir,
                f"samples_temperature_{self.temperatures[i]:.3f}"
                f"_annealed_to_{self.temperatures[j]:.3f}.npz",
            )
            np.savez(path, samples=samples)
            sub = samples[
                np.random.default_rng(0).integers(0, len(samples), cfg.test_batch_size)
            ]
            energies = _retry_on_runtime_error(
                lambda: jax.block_until_ready(
                    self.targets[j].log_prob(jnp.asarray(sub))
                )
            )
            self.key, k_t = jax.random.split(self.key)
            try:
                data = self.targets[j].sample_test_set(k_t, len(sub))
            except (ValueError, NotImplementedError):
                data = None
            prefix = f"test/T={self.temperatures[i]:.2f}->{self.temperatures[j]:.2f}"
            if data is not None:
                data_energies = self.targets[j].log_prob(data)
                m = energy_distances(
                    energies, data_energies, prefix=prefix,
                    energy_threshold=cfg.energy_masking_threshold,
                )
                m[f"{prefix}/data_energy_std"] = float(jnp.std(data_energies))
                if self.is_molecule:
                    m[f"{prefix}/dist_w2"] = interatomic_dist_w2(
                        self.targets[j], jnp.asarray(sub), data
                    )
                m.update(
                    self.targets[j].log_on_epoch_end(
                        jnp.asarray(sub), data, prefix=prefix,
                        out_dir=os.path.join(self.out_dir, "plots", "test"),
                        make_plots=cfg.make_plots,
                    )
                )
                all_metrics.update(m)
            all_metrics[f"{prefix}/energy_mean"] = float(-jnp.mean(energies))
        if self.logger is not None:
            self.logger.log_metrics(all_metrics, step=self.epoch)
        return all_metrics
