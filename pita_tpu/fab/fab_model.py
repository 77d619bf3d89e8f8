"""FAB: Flow Annealed Importance Sampling Bootstrap — losses + training loops.

Reference parity: ``fab/fab/core.py:18-277`` (FABModel loss suite) and
``fab/fab/train_with_prioritised_buffer.py`` (the prioritised-buffer
training loop). The flow is a ``FlowDistribution`` (flow.py), AIS comes from
``pita_tpu.fab.ais`` (min-var IS target g ∝ p^α q^{1−α} via ``p_target=False``),
and the buffer is the Gumbel-top-k ``PrioritisedBuffer``
(train/buffer.py:121-179).

TPU-first design: each loss is a pure function of (params, key); training
steps (AIS sampling + the inner buffer updates) are jitted whole — the
reference pays a host round-trip per gradient step.
"""

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pita_tpu.fab.ais import AISConfig, annealed_importance_sampling
from pita_tpu.train.buffer import (
    PrioritisedBuffer,
    prioritised_add,
    prioritised_init,
    prioritised_sample,
)

LOSS_TYPES = (
    "fab_alpha_div",
    "fab_ub_alpha_2_div",
    "forward_kl",
    "target_forward_kl",
    "flow_reverse_kl",
    "flow_alpha_2_div",
    "flow_alpha_2_div_unbiased",
    "flow_alpha_2_div_nis",
)


@dataclasses.dataclass(frozen=True)
class FABConfig:
    loss_type: str = "fab_alpha_div"
    alpha: float = 2.0
    batch_size: int = 128
    lr: float = 1e-4
    max_gradient_norm: float = 10.0
    n_intermediate_distributions: int = 4
    ais_spacing: str = "linear"
    transition: str = "hmc"
    # prioritised-buffer loop (train_with_prioritised_buffer.py)
    buffer_capacity: int = 10000
    min_buffer_length: int = 256
    n_batches_buffer_sampling: int = 4
    max_adjust_w_clip: Optional[float] = 10.0


def _ais_cfg(cfg: FABConfig, min_is_target: bool) -> AISConfig:
    return AISConfig(
        n_intermediate_distributions=cfg.n_intermediate_distributions,
        distribution_spacing_type=cfg.ais_spacing,
        transition=cfg.transition,
        p_target=not min_is_target,
        alpha=cfg.alpha if min_is_target else None,
    )


def fab_loss(flow, params, target_log_prob: Callable, key, cfg: FABConfig,
             data: Optional[jnp.ndarray] = None):
    """The FABModel loss suite (core.py:120-190), one entry per loss_type."""
    lt = cfg.loss_type
    B = cfg.batch_size
    if lt in ("fab_alpha_div", "fab_ub_alpha_2_div"):
        # AIS targets the minimum-variance IS distribution g ∝ p^α q^{1-α};
        # the flow's params are *not* differentiated through the AIS chain
        # (the reference detaches the AIS points)
        frozen = jax.lax.stop_gradient(params)
        res = annealed_importance_sampling(
            key,
            lambda k, n: flow.sample_and_log_prob(frozen, k, n),
            lambda x: flow.log_prob(frozen, x),
            target_log_prob,
            B,
            _ais_cfg(cfg, min_is_target=True),
        )
        x = jax.lax.stop_gradient(res.samples)
        log_w_ais = jax.lax.stop_gradient(res.log_w)
        log_q = flow.log_prob(params, x)
        if lt == "fab_alpha_div":
            # -sign(α)·E_softmax(w_ais)[log q] (core.py:120-135)
            return -np.sign(cfg.alpha) * jnp.sum(
                jax.nn.softmax(log_w_ais) * log_q
            )
        # upper-bound α=2 loss: logsumexp(log_w_ais + log p − log q) (:171-177)
        log_p = target_log_prob(x)
        return jax.scipy.special.logsumexp(log_w_ais + log_p - log_q)
    if lt == "flow_reverse_kl":
        x, log_q = flow.sample_and_log_prob(params, key, B)
        return jnp.mean(log_q) - jnp.mean(target_log_prob(x))
    if lt == "flow_alpha_2_div":
        x, log_q = flow.sample_and_log_prob(params, key, B)
        return jax.scipy.special.logsumexp(2 * (target_log_prob(x) - log_q))
    if lt == "flow_alpha_2_div_unbiased":
        x, log_q = flow.sample_and_log_prob(params, key, B)
        return jnp.mean(jnp.exp(2 * (target_log_prob(x) - log_q)) * log_q)
    if lt == "flow_alpha_2_div_nis":
        x, log_q = flow.sample_and_log_prob(params, key, B)
        w2 = jax.lax.stop_gradient(jnp.exp(2 * (target_log_prob(x) - log_q)))
        return -jnp.mean(w2 * log_q)
    if lt in ("forward_kl", "target_forward_kl"):
        assert data is not None, f"{lt} needs target samples"
        return -jnp.mean(flow.log_prob(params, data))
    raise ValueError(f"unknown loss_type {lt}")


def train_fab(flow, target_log_prob: Callable, cfg: FABConfig, key,
              n_iterations: int, params=None,
              target_sampler: Optional[Callable] = None):
    """Plain FAB training loop (fab/fab/train.py capability)."""
    if params is None:
        key, k0 = jax.random.split(key)
        params = flow.init(k0)
    opt = optax.chain(
        optax.clip_by_global_norm(cfg.max_gradient_norm), optax.adam(cfg.lr)
    )
    opt_state = opt.init(params)

    def step(params, opt_state, k, data):
        def loss_fn(p):
            return fab_loss(flow, p, target_log_prob, k, cfg, data=data)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step = jax.jit(step)
    losses = []
    for i in range(n_iterations):
        key, k_i, k_d = jax.random.split(key, 3)
        data = (
            target_sampler(k_d, cfg.batch_size)
            if cfg.loss_type in ("forward_kl", "target_forward_kl")
            else None
        )
        params, opt_state, loss = step(params, opt_state, k_i, data)
        losses.append(float(loss))
    return params, losses


def train_fab_with_prioritised_buffer(
    flow, target_log_prob: Callable, cfg: FABConfig, key, n_iterations: int,
    params=None,
):
    """FAB with the prioritised replay buffer
    (train_with_prioritised_buffer.py:108-210): each outer iteration runs AIS
    once, stores (x, log_w, log_q); then ``n_batches_buffer_sampling`` inner
    gradient steps re-weight stored samples by
    w_adjust = clip(exp((1−α)(log_q_new − log_q_old))) and descend
    −E[w_adjust·log q], adjusting buffer weights in place."""
    if params is None:
        key, k0 = jax.random.split(key)
        params = flow.init(k0)
    opt = optax.chain(
        optax.clip_by_global_norm(cfg.max_gradient_norm), optax.adam(cfg.lr)
    )
    opt_state = opt.init(params)
    buf = prioritised_init(cfg.buffer_capacity, flow.dim)

    ais_cfg = _ais_cfg(cfg, min_is_target=True)

    @jax.jit
    def ais_step(params, k):
        res = annealed_importance_sampling(
            k,
            lambda kk, n: flow.sample_and_log_prob(params, kk, n),
            lambda x: flow.log_prob(params, x),
            target_log_prob,
            cfg.batch_size,
            ais_cfg,
        )
        log_q = flow.log_prob(params, res.samples)
        return res.samples, res.log_w, log_q, res.ess_ais

    @jax.jit
    def inner_step(params, opt_state, buf: PrioritisedBuffer, k):
        x, log_w, log_q_old, idx = prioritised_sample(buf, k, cfg.batch_size)

        def loss_fn(p):
            log_q = flow.log_prob(p, x)
            log_w_adjust = (1 - cfg.alpha) * (
                jax.lax.stop_gradient(log_q) - log_q_old
            )
            w_adjust = jnp.exp(log_w_adjust)
            if cfg.max_adjust_w_clip is not None:
                w_adjust = jnp.minimum(w_adjust, cfg.max_adjust_w_clip)
            loss = -jnp.mean(w_adjust * log_q)
            return loss, (log_w_adjust, log_q)

        (loss, (log_w_adjust, log_q)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        # NaN/Inf guard: skip the update (reference :181-189)
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
        updates, new_opt_state = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        params = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new_params, params
        )
        opt_state = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new_opt_state, opt_state
        )
        # on-the-fly buffer weight adjustment (:199-202)
        buf = buf._replace(
            log_w=buf.log_w.at[idx].add(jnp.where(ok, log_w_adjust, 0.0)),
            log_q=buf.log_q.at[idx].set(
                jnp.where(ok, jax.lax.stop_gradient(log_q), buf.log_q[idx])
            ),
        )
        return params, opt_state, buf, loss

    history = []
    for i in range(n_iterations):
        key, k_ais, k_in = jax.random.split(key, 3)
        x, log_w, log_q, ess = ais_step(params, k_ais)
        buf = prioritised_add(buf, x, log_w, log_q)
        if int(buf.size) >= cfg.min_buffer_length:
            for j in range(cfg.n_batches_buffer_sampling):
                params, opt_state, buf, loss = inner_step(
                    params, opt_state, buf, jax.random.fold_in(k_in, j)
                )
            history.append({"loss": float(loss), "ess_ais": float(ess)})
    return params, buf, history
