"""The PITA multi-loss training objective.

Reference parity: ``pita/src/models/energytemp_module.py:323-565`` — six
weighted losses on buffer samples at a sampled noise level:

1. **score matching** — denoiser MSE to x0 with EDM λ(h) = (h+1)/h weight,
   gated to ht ≥ h(threshold) (:392-415),
2. **energy-score distillation** — energy-net denoiser matches the (stopped)
   score-net denoiser (:417-455),
3. **target-score** — force-based denoising target near t=0:
   x̂0 = xt − clip(−force)·ht, averaged over the ht < h(threshold) subset
   (:457-495),
4. **DEM energy** — MC-estimated noised energy regression on the small-noise
   subset, masked at |U|>1e3 (:497-523),
5. **energy matching** — U_θ(h0, x0) ≈ −log p(x0), masked at threshold (:541-565),
6. **dU/dt L2 regularization** (:379-382; reference sums over the batch).

Gradients flow to both parameter trees in one ``jax.grad``; the energy-score
loss stops gradients through the score-net denoiser (the reference detaches,
:450). Everything is one jittable pure function — including the double
derivative (∂/∂params of ∂U/∂(x,h)) the reference could not torch.compile.
"""

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from pita_tpu.train.dem_estimator import clip_scores, estimate_Rt
from pita_tpu.utils.mean_free import remove_mean


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss weights and gates (configs/model/energytemp.yaml:96-110)."""

    w_energy_score: float = 1.0
    w_score: float = 1.0
    w_energy_matching: float = 1.0
    w_target_score: float = 0.01
    w_dem_energy: float = 0.0
    w_dU_dt_regularization: float = 0.0
    time_threshold_score: float = 0.0
    time_threshold_target_score: float = 0.2
    dem_time_threshold: float = 0.2
    dem_num_mc_samples: int = 1000
    energy_threshold: float = 1e3
    max_score_norm: float = 1000.0
    only_train_score: bool = False

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def _subset_mean(per_sample, mask):
    """Mean over the masked subset (reference indexes the subset then .mean())."""
    denom = jnp.maximum(jnp.sum(mask.astype(per_sample.dtype)), 1.0)
    return jnp.sum(per_sample * mask) / denom


def compute_losses(
    score_wrapper,
    energy_wrapper,
    params_score,
    params_energy,
    noise_schedule,
    cfg: LossConfig,
    key,
    x0: jnp.ndarray,
    x0_energies: jnp.ndarray,
    x0_forces: jnp.ndarray,
    beta,
    target: Any = None,
    n_particles: int = 1,
    n_spatial_dim: int = 1,
    mean_free: bool = False,
):
    """Returns (total_loss, aux) for one batch (energytemp_module.py:323-390,620-694)."""
    B = x0.shape[0]
    k_sigma, k_noise, k_dem = jax.random.split(key, 3)
    ln_sigma = noise_schedule.sample_ln_sigma(k_sigma, B)
    ht = jnp.exp(2 * ln_sigma)
    h0 = noise_schedule.h(jnp.zeros_like(ht))

    z = jax.random.normal(k_noise, x0.shape, x0.dtype)
    if mean_free:
        z = remove_mean(z, n_particles, n_spatial_dim)
        x0 = remove_mean(x0, n_particles, n_spatial_dim)
    xt = x0 + z * jnp.sqrt(ht)[:, None]
    lambda_t = (ht + 1.0) / ht

    D_score = score_wrapper.denoiser(params_score, ht, xt, beta)

    # 1. score matching (:392-415)
    if cfg.w_score > 0:
        h_thr = noise_schedule.h(jnp.asarray(cfg.time_threshold_score))
        t_mask = ht >= h_thr
        score_per = jnp.sum((D_score - x0) ** 2, axis=-1) * t_mask
        score_loss_vec = lambda_t * score_per
        score_loss = jnp.mean(score_loss_vec)
    else:
        score_loss_vec = jnp.zeros((B,), x0.dtype)
        score_loss = jnp.zeros((), x0.dtype)

    if cfg.only_train_score:
        zero = jnp.zeros((), x0.dtype)
        total = cfg.w_score * score_loss
        aux = {
            "loss": total, "score_loss": score_loss, "energy_score_loss": zero,
            "target_score_loss": zero, "dem_energy_loss": zero,
            "energy_matching_loss": zero, "dU_dt_regularization_loss": zero,
            "ln_sigma": ln_sigma, "score_loss_per_sample": score_loss_vec,
            "energy_score_loss_per_sample": jnp.zeros((B,), x0.dtype),
        }
        return total, aux

    # 3. target score (:457-495): force-based denoising target near t=0
    if cfg.w_target_score > 0:
        h_thr_ts = noise_schedule.h(jnp.asarray(cfg.time_threshold_target_score))
        ts_mask = ht < h_thr_ts
        nabla_U0 = clip_scores(-x0_forces, cfg.max_score_norm, n_particles, n_spatial_dim)
        target_x0 = xt - nabla_U0 * ht[:, None]
        ts_per = jnp.sum((target_x0 - D_score) ** 2, axis=-1)
        target_score_loss = _subset_mean(ts_per, ts_mask)
    else:
        target_score_loss = jnp.zeros((), x0.dtype)

    # 2. energy-score distillation (:417-455) + dU/dt via the chain rule
    need_Ut = cfg.w_dem_energy > 0
    if cfg.w_energy_score > 0:
        D_energy, dU_dh, U_t = energy_wrapper.denoiser_and_energy(
            params_energy, ht, xt, beta
        )
        t_of_h = noise_schedule.t(ht)
        dU_dt = dU_dh * noise_schedule.dh_dt(t_of_h)
        es_per = jnp.sum((D_energy - jax.lax.stop_gradient(D_score)) ** 2, axis=-1)
        es_loss_vec = lambda_t * es_per
        energy_score_loss = jnp.mean(es_loss_vec)
    else:
        U_t = (
            energy_wrapper.energy(params_energy, ht, xt, beta)
            if need_Ut
            else jnp.zeros((B,), x0.dtype)
        )
        dU_dt = jnp.zeros((B,), x0.dtype)
        es_loss_vec = jnp.zeros((B,), x0.dtype)
        energy_score_loss = jnp.zeros((), x0.dtype)

    # 5. energy matching at h0 (:541-565)
    if cfg.w_energy_matching > 0:
        U0_true = -x0_energies
        em_mask = U0_true <= cfg.energy_threshold
        U0_pred = energy_wrapper.energy(params_energy, h0, x0, beta)
        energy_matching_loss = jnp.mean((U0_true - U0_pred) ** 2 * em_mask)
    else:
        energy_matching_loss = jnp.zeros((), x0.dtype)

    # 4. DEM energy regression (:497-523)
    if cfg.w_dem_energy > 0 and target is not None:
        h_thr_dem = noise_schedule.h(jnp.asarray(cfg.dem_time_threshold))
        dem_mask = ht < h_thr_dem
        Ut_est = -estimate_Rt(k_dem, ht, xt, target.log_prob, cfg.dem_num_mc_samples)
        ok = Ut_est <= cfg.energy_threshold
        dem_per = (Ut_est - U_t) ** 2 * ok
        dem_energy_loss = _subset_mean(dem_per, dem_mask)
    else:
        dem_energy_loss = jnp.zeros((), x0.dtype)

    # 6. dU/dt L2 regularization (:379-382; reference sums over the batch)
    if cfg.w_dU_dt_regularization > 0:
        dU_dt_reg = jnp.sum(dU_dt**2)
    else:
        dU_dt_reg = jnp.zeros((), x0.dtype)

    total = (
        cfg.w_energy_score * energy_score_loss
        + cfg.w_score * score_loss
        + cfg.w_target_score * target_score_loss
        + cfg.w_dem_energy * dem_energy_loss
        + cfg.w_energy_matching * energy_matching_loss
        + cfg.w_dU_dt_regularization * dU_dt_reg
    )
    aux = {
        "loss": total,
        "score_loss": score_loss,
        "energy_score_loss": energy_score_loss,
        "target_score_loss": target_score_loss,
        "dem_energy_loss": dem_energy_loss,
        "energy_matching_loss": energy_matching_loss,
        "dU_dt_regularization_loss": dU_dt_reg,
        # for ln-sigma-stratified diagnostics (energytemp_module.py:300-321)
        "ln_sigma": ln_sigma,
        "score_loss_per_sample": score_loss_vec,
        "energy_score_loss_per_sample": es_loss_vec,
    }
    return total, aux


def stratified_losses(ln_sigma, per_sample_loss, bin_edges, loss_name="loss"):
    """Bin per-sample losses by ln σ (energytemp_module.py:300-321), on host."""
    import numpy as np

    ln_sigma = np.asarray(ln_sigma).ravel()
    losses = np.asarray(per_sample_loss).ravel()
    edges = np.asarray(bin_edges)
    num_bins = len(edges) - 1
    idx = np.clip(np.digitize(ln_sigma, edges), 0, num_bins - 1)
    sums = np.bincount(idx, weights=losses, minlength=num_bins)
    counts = np.bincount(idx, minlength=num_bins)
    out = {}
    for b in np.unique(idx):
        out[f"{loss_name} ln_sigma=[{edges[b]:.2f},{edges[b+1]:.2f})"] = (
            sums[b] / max(counts[b], 1)
        )
    return out
