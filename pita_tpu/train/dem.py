"""DEM pretraining: train the score net before the PITA phase begins.

Reference parity: ``pita/src/models/energytemp_module.py:567-618`` (the
``pre_training_step`` force-based target-score loss used by ``training_step``
when ``epoch < dem.num_training_epochs``, and the ``dem_pre_training_step``
iDEM variant regressing on the MC-estimated ``∇ log E[e^E]`` target), plus
``eval_epoch_end_dem`` (:769-800): periodically sample with a *plain* reverse
SDE (no energy net, no FK weights) and refill buffer 0. DEM defaults from
``configs/model/energytemp.yaml:114-131``.
"""

import dataclasses

import jax
import jax.numpy as jnp

from pita_tpu.schedules.noise import ElucidatingNoiseSchedule
from pita_tpu.train.dem_estimator import clip_scores, estimate_grad_Rt
from pita_tpu.utils.mean_free import remove_mean


@dataclasses.dataclass(frozen=True)
class DEMConfig:
    """configs/model/energytemp.yaml:114-131."""

    num_training_epochs: int = 0
    training_batch_size: int = 512
    num_samples_to_generate_per_epoch: int = 2000
    num_mc_samples: int = 1000
    num_integration_steps: int = 1000
    check_val_every_n_epochs: int = 10
    max_score_norm: float = 100.0
    noise_schedule: ElucidatingNoiseSchedule = ElucidatingNoiseSchedule(
        sigma_min=0.02, sigma_max=2.0, rho=7.0
    )
    use_mc_target: bool = False  # False = force-based pre_training_step (default path)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def pretrain_loss(
    score_wrapper,
    params_score,
    dem_cfg: DEMConfig,
    key,
    x0: jnp.ndarray,
    x0_forces: jnp.ndarray,
    beta,
    target=None,
    n_particles: int = 1,
    n_spatial_dim: int = 1,
    mean_free: bool = False,
):
    """One pretraining loss (energytemp_module.py:592-618 / :567-590)."""
    B = x0.shape[0]
    k_sigma, k_noise, k_mc = jax.random.split(key, 3)
    ln_sigma = dem_cfg.noise_schedule.sample_ln_sigma(k_sigma, B)
    ht = jnp.exp(2 * ln_sigma)
    z = jax.random.normal(k_noise, x0.shape, x0.dtype)
    if mean_free:
        z = remove_mean(z, n_particles, n_spatial_dim)
        x0 = remove_mean(x0, n_particles, n_spatial_dim)
    xt = x0 + z * jnp.sqrt(ht)[:, None]

    if dem_cfg.use_mc_target:
        # iDEM: regress the score on -clip(∇ R_t) (:525-539,567-590)
        assert target is not None
        pred = score_wrapper.score(params_score, ht, xt, beta)
        nabla_Ut_est = -estimate_grad_Rt(
            k_mc, ht, xt, target.log_prob, dem_cfg.num_mc_samples
        )
        nabla_Ut_est = clip_scores(
            nabla_Ut_est, dem_cfg.max_score_norm, n_particles, n_spatial_dim
        )
        nabla_Ut_est = jax.lax.stop_gradient(nabla_Ut_est)
        return jnp.mean(jnp.sum((nabla_Ut_est - pred) ** 2, axis=-1))

    # force-based target score at all noise levels (:592-618)
    D = score_wrapper.denoiser(params_score, ht, xt, beta)
    nabla_U0 = clip_scores(-x0_forces, dem_cfg.max_score_norm, n_particles, n_spatial_dim)
    target_x0 = xt - nabla_U0 * ht[:, None]
    return jnp.mean(jnp.sum((target_x0 - D) ** 2, axis=-1))
