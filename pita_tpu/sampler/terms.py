"""Drift assembly for the annealed reverse-time VE SDE.

Reference parity: ``pita/src/models/components/sdes.py`` (``VEReverseSDE.f``,
:130-239). In debiased mode the position drift mixes the learned energy
gradient and score,

    drift_X = γ(t)·(−∇_x U_θ)·g²/2 + γ(t)·b_t,     b_t = s_θ·g²/2,

(the reference ties gamma_score to gamma_energy, sdes.py:142-143) and the
Radon–Nikodym log-weight drift is

    drift_A = γ²·⟨−∇U, b_t⟩ + γ·div(b_t) + γ·∂U/∂t + (dγ/dt)·U,

clamped at its 0.9 batch quantile (sdes.py:222-230). With no score net, b_t is
built from the energy gradient and div(b_t) from the exact Laplacian
(sdes.py:205-216). Non-debiased mode is the plain reverse VE SDE
(``f_not_debiased``, sdes.py:117-128).

Everything here is a pure function of (params, t, x): no ``enable_grad``
blocks, no ``.detach()`` bookkeeping — ``jax.grad`` over pure functions gives
∇_x U, ∂U/∂t, and the score-Jacobian trace in one traced program that XLA
fuses into the sampler scan.
"""

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from pita_tpu.ops.divergence import (
    exact_divergence,
    exact_laplacian,
    hutchinson_divergence,
)


def _score_eval(score_wrapper, params, ht, x, beta, backbone_fwd=None):
    """score(x) with a pluggable backbone forward (e.g. the fused Pallas
    kernel on the sampler path, where no AD is needed — the integrator
    stop-gradients the drift). None → the wrapper's own path."""
    if backbone_fwd is None:
        return score_wrapper.score(params, ht, x, beta)
    from pita_tpu.nets.precondition import _bcast, _coeffs

    B = x.shape[0]
    htb = _bcast(ht, B, x.dtype)
    c_s, c_in, c_out, c_noise = _coeffs(htb)
    F = backbone_fwd(params, c_noise, c_in[:, None] * x, beta)
    score = ((c_s - 1.0)[:, None] * x + c_out[:, None] * F) / htb[:, None]
    if score_wrapper.precondition_beta:
        bb = _bcast(beta, B, x.dtype)
        score = score * bb[:, None]
    return score


class SDETerms(NamedTuple):
    """Per-chain drift terms (reference sdes.py:34-92)."""

    drift_X: jnp.ndarray  # (B, D)
    drift_A: jnp.ndarray  # (B,)
    divergence: Optional[jnp.ndarray] = None  # γ-free div(b_t), (B,)
    cross_term: Optional[jnp.ndarray] = None  # ⟨−∇U, b_t⟩, (B,)
    dUt_dt: Optional[jnp.ndarray] = None  # ∂U_θ/∂t, (B,)


def compute_sde_terms(
    score_wrapper,
    energy_wrapper,
    params_score,
    params_energy,
    noise_schedule,
    annealing_schedule,
    t: jnp.ndarray,
    x: jnp.ndarray,
    beta,
    *,
    debias: bool = True,
    compute_weights: bool = True,
    pin_energy: bool = False,
    energy_function: Any = None,
    clip_quantile: float = 0.9,
    divergence_mode: str = "exact",
    divergence_chunk_size: int = None,
    divergence_tangent_chunk: int = None,
    hutchinson_probes: int = 1,
    hutchpp_rank: int = 16,
    divergence_key=None,
    div_bt_override=None,
    score_backbone_fwd=None,
    energy_backbone_fwd=None,
    pallas_divergence: bool = False,
    pallas_divergence_block_b: int = 2,
    pallas_tangent_chunk: int = 16,
    pallas_interpret: bool = False,
    divergence_g_kernel: bool = False,
    g_rows_per_block: int = 4,
) -> SDETerms:
    """Assemble drift_X and drift_A at times t (B,) for chains x (B, D)."""
    B = x.shape[0]
    t = jnp.broadcast_to(jnp.asarray(t, x.dtype).reshape(-1), (B,))
    gamma = annealing_schedule.gamma(t)
    g2 = noise_schedule.g(t) ** 2
    ht = noise_schedule.h(t)

    has_score = score_wrapper is not None and params_score is not None

    if not debias:
        # plain reverse VE SDE: drift = γ · s_θ · g² (sdes.py:117-128)
        s_t = _score_eval(score_wrapper, params_score, ht, x, beta, score_backbone_fwd)
        drift_X = gamma[:, None] * s_t * g2[:, None]
        return SDETerms(drift_X=drift_X, drift_A=jnp.zeros((B,), x.dtype))

    assert energy_wrapper is not None and params_energy is not None

    pin_kw = dict(pin=pin_energy, t=t, energy_function=energy_function) if pin_energy else {}

    def U_of_tx(tt, xx):
        """U_θ as a function of integration time (through h) and position."""
        return energy_wrapper.energy(
            params_energy, noise_schedule.h(tt), xx, beta,
            backbone_fwd=energy_backbone_fwd, **pin_kw,
        )

    # one energy pass: the summed value drives the (x, t) grads and the
    # per-sample U rides out as aux (the reference evaluates the energy net
    # separately for U and for its grads — a full extra forward)
    def U_sum_and_vec(xx, tt):
        Uv = U_of_tx(tt, xx)
        return jnp.sum(Uv), Uv

    (_, U), (nabla_U, dU_dt) = jax.value_and_grad(
        U_sum_and_vec, argnums=(0, 1), has_aux=True
    )(x, t)

    if has_score:
        s_t = _score_eval(score_wrapper, params_score, ht, x, beta, score_backbone_fwd)
        bt = s_t * g2[:, None] / 2
    else:
        bt = -nabla_U * g2[:, None] / 2

    drift_X = gamma[:, None] * (-nabla_U) * g2[:, None] / 2 + gamma[:, None] * bt

    if not compute_weights:
        return SDETerms(drift_X=drift_X, drift_A=jnp.zeros((B,), x.dtype))

    if div_bt_override is not None:
        # reuse a previously computed div(b_t) (coarse quadrature of the
        # smooth divergence term in the weight integral — see integrator's
        # divergence_update_interval)
        div_bt = div_bt_override
    elif has_score:
        score_fn = lambda tt, xx: score_wrapper.score(
            params_score, noise_schedule.h(tt), xx, beta
        )
        if divergence_mode == "hutchinson":
            # unbiased trace estimate — O(probes) forwards instead of O(D);
            # trades exactness of the FK weights for throughput
            # (utils.py:80-96 capability)
            assert divergence_key is not None
            div_st = hutchinson_divergence(
                score_fn, t, x, divergence_key, hutchinson_probes
            )
        elif divergence_mode == "hutchpp":
            # Hutch++: rank-k deflation + residual probes — 2k+m passes with
            # far lower variance than plain Hutchinson at equal passes
            from pita_tpu.ops.divergence import hutchpp_divergence

            assert divergence_key is not None
            div_st = hutchpp_divergence(
                score_fn, t, x, divergence_key,
                rank=hutchpp_rank, num_probes=hutchinson_probes,
            )
        else:
            # exact trace; EGNN backbones route through the edge-operator
            # factorization (nets/egnn_fast.py) — same math as jacfwd, no
            # (T, N², F) tangent tensors
            from pita_tpu.nets.egnn_fast import (
                score_divergence_fast,
                supports_fast_divergence,
            )

            if (
                divergence_mode != "exact_generic"
                and supports_fast_divergence(getattr(score_wrapper, "backbone", None))
            ):
                div_st = score_divergence_fast(
                    score_wrapper, params_score, ht, x, beta,
                    tangent_chunk=divergence_tangent_chunk,
                    chain_chunk=divergence_chunk_size,
                    pallas=pallas_divergence,
                    pallas_block_b=pallas_divergence_block_b,
                    pallas_tangent_chunk=pallas_tangent_chunk,
                    pallas_interpret=pallas_interpret,
                    g_kernel=divergence_g_kernel,
                    g_rows_per_block=g_rows_per_block,
                )
            else:
                div_st = exact_divergence(
                    score_fn, t, x, chunk_size=divergence_chunk_size
                )
        div_bt = div_st * g2 / 2
    else:
        # the exact Laplacian is forward-over-reverse; a custom_vjp backbone
        # override is not forward-differentiable, so this path always uses
        # the XLA backbone
        def U_xla(tt, xx):
            return energy_wrapper.energy(
                params_energy, noise_schedule.h(tt), xx, beta, **pin_kw
            )

        lap_U = exact_laplacian(U_xla, t, x, chunk_size=divergence_chunk_size)
        div_bt = -lap_U * g2 / 2

    inner = jnp.sum(-nabla_U * bt, axis=-1)
    drift_A = (
        gamma * gamma * inner
        + gamma * div_bt
        + gamma * dU_dt
        + annealing_schedule.dgamma_dt(t) * U
    )
    # clip the weight drift at its batch 0.9-quantile (sdes.py:230); 1.0 = off
    if clip_quantile < 1.0:
        drift_A = jnp.minimum(drift_A, jnp.quantile(drift_A, clip_quantile))

    return SDETerms(
        drift_X=jax.lax.stop_gradient(drift_X),
        drift_A=jax.lax.stop_gradient(drift_A),
        divergence=div_bt,
        cross_term=inner,
        dUt_dt=dU_dt,
    )
