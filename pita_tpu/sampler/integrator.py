"""Weighted reverse-SDE integrator as a single ``lax.scan`` program.

Reference parity: ``pita/src/models/components/sde_integration.py``
(``WeightedSDEIntegrator``): a Python for-loop over 1000 Euler–Maruyama steps
with per-step DDP sharding, per-step ``all_gather``, host-side ``np.digitize``
resampling and tqdm — replaced here by one compiled scan:

- per step: drift terms → EM update → mean-free projection → weight
  accumulation gated by the [start, end) resampling window → branch-free
  systematic resampling every ``resampling_interval`` steps,
- optional final resample against the *true* target with the learned energy as
  proposal log-density (sde_integration.py:158-184),
- optional negative-time descent (plain force ascent / ULA, :353-360),
- optional MALA refinement with fixed or adaptive step size targeting ~0.55
  acceptance (:362-470),
- per-step diagnostics (log-weights, unique-ancestor counts, SDE-term
  statistics, MALA acceptance rates) collected as scan outputs on device.

The step flags (accumulate / freeze / resample) are *precomputed* boolean
arrays fed through scan ``xs``, so the compiled program is fully static: no
data-dependent control flow, no recompilation across calls with the same
config.

Chain-parallelism over a device mesh lives in ``pita_tpu.parallel.sharded``;
this module is mesh-agnostic (shard the chain batch of ``x1`` and everything
follows, with weights gathered only for the global resample).
"""

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pita_tpu.ops.resampling import systematic_resample, count_unique
from pita_tpu.sampler.terms import compute_sde_terms
from pita_tpu.utils.mean_free import remove_mean


@dataclasses.dataclass(frozen=True)
class IntegratorConfig:
    """Static sampler configuration (configs/model/energytemp.yaml:72-87)."""

    num_integration_steps: int = 1000
    start_resampling_step: int = 0
    end_resampling_step: int = 1000
    resampling_interval: int = 1
    resample_at_end: bool = False
    time_range: float = 1.0
    diffusion_scale: float = 1.0
    num_negative_time_steps: int = 0
    dt_negative_time: float = 1e-13
    do_langevin: bool = False
    post_mcmc_steps: int = 0
    adaptive_mcmc: bool = True
    should_mean_free: bool = True
    debias_inference: bool = True
    pin_energy: bool = False
    # divergence estimator for the FK weight drift: "exact" (Jacobian trace,
    # reference parity; EGNN backbones use the edge-operator fast path),
    # "exact_generic" (force the jacfwd path), "hutchinson" (unbiased,
    # O(probes)), or "hutchpp" (rank-deflated, 2·rank+probes passes)
    divergence_mode: str = "exact"
    # chains per divergence chunk — bounds the D-wide tangent batch in HBM
    # (TPU analog of the reference's inference_batch_size micro-batching)
    divergence_chunk_size: int = None
    # tangents per chunk for the edge-operator exact path (memory bound)
    divergence_tangent_chunk: int = None
    hutchinson_probes: int = 1
    hutchpp_rank: int = 16
    # fused Pallas EGNN forward for the score evaluation inside the EM step
    # (inference-only path — the drift is stop-gradient'd, so no AD needed)
    pallas_score_forward: bool = False
    # fused Pallas EGNN forward+backward for the drift's energy gradient
    # (∇_x U_θ / ∂U/∂t through a custom-VJP kernel pair)
    pallas_energy_grad: bool = False
    # fused Pallas exact Jacobian-trace for the FK divergence (linearize in
    # VMEM + chunked tangent basis — no (T, N², F) HBM tensors)
    pallas_divergence: bool = False
    pallas_divergence_block_b: int = 2
    # G-operator Pallas kernel for the exact edge-operator divergence: builds
    # the per-edge F×F operators in VMEM and contracts multi-row MXU blocks
    # against the tangent panel — the (B, N², F²) operator never reaches HBM
    # (ops/pallas/g_op.py; the round-3 design from PERF.md). Experimental:
    # compiled use needs PITA_TPU_ENABLE_EXPERIMENTAL_PALLAS=1.
    divergence_g_kernel: bool = False
    g_rows_per_block: int = 4
    pallas_tangent_chunk: int = 16
    pallas_block_b: int = 8
    pallas_interpret: bool = False  # interpret mode (CPU tests)
    # FK weight-drift clamp quantile (sdes.py:230 clamps at 0.9; 1.0 = off)
    weight_clip_quantile: float = 0.9
    # adaptive (ESS-triggered) resampling: at steps the interval schedule
    # allows, resample only when the normalized ESS of the accumulated FK
    # weights drops below this threshold (standard adaptive SMC; None =
    # always resample on schedule, reference parity). Weights accumulate
    # between triggers instead of resetting every step — this both saves
    # resampling work and removes the per-step selection pressure that makes
    # NOISY weight estimates (hutchinson/hutchpp divergence) bias the
    # population (PERF.md: ~15% tempered-width shrinkage at interval=1).
    ess_resampling_threshold: Optional[float] = None
    # recompute the (expensive) divergence term every K steps and reuse it in
    # between — a coarser quadrature of the smooth div(b_t) term in the weight
    # integral, NOT an estimator approximation. 1 = every step (parity).
    divergence_update_interval: int = 1
    # run the integration scan in host-level segments of this many steps
    # (None = one dispatch). Bounds single-execution length for runtimes with
    # watchdogs and gives preemption points; results are identical.
    segment_size: Optional[int] = None

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


class IntegrateResult(NamedTuple):
    samples: jnp.ndarray  # (B, D) final samples
    logweights: jnp.ndarray  # (steps[+1], B) log-weight trajectory
    num_unique: jnp.ndarray  # (steps[+1],) unique ancestors per step
    term_stats: dict  # {name: (steps,) std over chains} sampler diagnostics
    acceptance_rates: jnp.ndarray  # (post_mcmc_steps,) MALA acceptance


_SEGMENT_CACHE: dict = {}


def _weak_key(*objs):
    """Identity-based cache key component that cannot collide after GC.

    ``id()`` values are recycled once an object dies, so an id-keyed cache can
    silently return a function compiled against a *different* object's
    constants. ``weakref.ref`` hashes/compares by referent identity while the
    referent is alive, and a dead ref never equals a fresh ref to a new object
    at the same address — stale entries become unreachable instead of wrong.
    Objects that don't support weak references fall back to a strong ref
    (keeping them alive pins their id, which is equally collision-free).
    """
    import weakref

    out = []
    for o in objs:
        try:
            out.append(weakref.ref(o))
        except TypeError:
            out.append(o)
    return tuple(out)


def _prune_dead(cache: dict):
    import weakref

    dead = [
        k for k in cache
        if any(isinstance(c, weakref.ref) and c() is None for c in k[0])
    ]
    for k in dead:
        del cache[k]


def _step_flags(cfg: IntegratorConfig, resampling_interval: int):
    """Precompute per-step gating flags (sde_integration.py:277-297)."""
    steps = np.arange(cfg.num_integration_steps)
    in_window = (steps >= cfg.start_resampling_step) & (steps < cfg.end_resampling_step)
    freeze = steps < cfg.start_resampling_step
    if resampling_interval == -1:
        resample = np.zeros_like(in_window)
    else:
        resample = in_window & (((steps + 1) % resampling_interval) == 0)
    return in_window, freeze, resample


def integrate_sde(
    key,
    x1: jnp.ndarray,
    score_wrapper,
    energy_wrapper,
    params_score,
    params_energy,
    noise_schedule,
    annealing_schedule,
    target,
    beta,
    cfg: IntegratorConfig,
    resampling_interval: Optional[int] = None,
    compile_only: bool = False,
) -> IntegrateResult:
    """Integrate the annealed reverse SDE from prior samples ``x1``.

    Mirrors ``WeightedSDEIntegrator.integrate_sde`` (sde_integration.py:98-212)
    as a pure jittable function. ``beta`` may be a traced scalar.

    ``compile_only=True`` (segmented mode only) AOT-compiles the segment
    program — the expensive executable, >5.5 min cold for peptide eval shapes
    (NOTES round 4) — without running any integration step, then returns
    ``None``. Dispatched ahead of a training window in a sacrificial process
    it fills the persistent compilation cache so the real eval hits it warm.
    """
    if resampling_interval is None:
        resampling_interval = cfg.resampling_interval
    if compile_only and not (
        cfg.segment_size is not None
        and cfg.segment_size < cfg.num_integration_steps
    ):
        raise ValueError(
            "compile_only requires segmented mode (segment_size < steps); "
            "non-segmented programs are AOT-compiled by the caller's jit "
            "(Trainer.prewarm_eval_compiles)"
        )

    B, D = x1.shape
    n = cfg.num_integration_steps
    times = jnp.linspace(cfg.time_range, 0.0, n + 1)[:-1]
    dt = cfg.time_range / n

    in_window, freeze, resample_f = _step_flags(cfg, resampling_interval)

    n_part = getattr(target, "n_particles", 1)
    n_sdim = getattr(target, "n_spatial_dim", D)

    def maybe_mean_free(x):
        if cfg.should_mean_free and getattr(target, "is_molecule", False):
            return remove_mean(x, n_part, n_sdim)
        return x

    def _experimental_pallas_allowed():
        # the fused EGNN kernels are a documented post-mortem (PERF.md), not
        # the production path; a kernel fault kills the shared TPU worker and
        # anything else running on the chip. Compiled (non-interpret) use
        # therefore requires an explicit opt-in env var — never flip these
        # flags in bench/production presets.
        if cfg.pallas_interpret:
            return True
        import os

        if os.environ.get("PITA_TPU_ENABLE_EXPERIMENTAL_PALLAS") == "1":
            return True
        raise RuntimeError(
            "pallas_score_forward/pallas_energy_grad/pallas_divergence are "
            "experimental (rejected from production, see PERF.md); compiled "
            "use can fault a shared TPU worker. Set "
            "PITA_TPU_ENABLE_EXPERIMENTAL_PALLAS=1 to opt in, or "
            "pallas_interpret=True for CPU-interpret testing."
        )

    score_backbone_fwd = None
    if cfg.pallas_score_forward and score_wrapper is not None:
        _experimental_pallas_allowed()
        from pita_tpu.nets.egnn_fast import supports_fast_divergence
        from pita_tpu.ops.pallas.egnn_fwd import egnn_forward_pallas

        if supports_fast_divergence(getattr(score_wrapper, "backbone", None)):
            score_backbone_fwd = (
                lambda p, tt, xx, bb: egnn_forward_pallas(
                    p, score_wrapper.backbone, tt, xx, bb,
                    block_b=cfg.pallas_block_b, interpret=cfg.pallas_interpret,
                )
            )

    energy_backbone_fwd = None
    if cfg.pallas_energy_grad and energy_wrapper is not None:
        _experimental_pallas_allowed()
        from pita_tpu.nets.egnn_fast import supports_fast_divergence
        from pita_tpu.ops.pallas.egnn_fwd import egnn_forward_pallas_ad

        if supports_fast_divergence(getattr(energy_wrapper, "backbone", None)):
            energy_backbone_fwd = (
                lambda p, tt, xx, bb: egnn_forward_pallas_ad(
                    p, energy_wrapper.backbone, tt, xx, bb,
                    block_b=cfg.pallas_block_b, interpret=cfg.pallas_interpret,
                )
            )
    if cfg.pallas_divergence or cfg.divergence_g_kernel:
        _experimental_pallas_allowed()

    def body(carry, inp):
        # params and beta ride in the carry (unchanged) so the compiled
        # segment function is reusable across parameter updates
        x, a, div_c, k, ps_c, pe_c, beta_c = carry
        t, acc_f, frz_f, res_f, rediv_f = inp
        k, k_diff, k_res, k_div = jax.random.split(k, 4)

        def _terms(div_override):
            return compute_sde_terms(
                score_wrapper,
                energy_wrapper,
                ps_c,
                pe_c,
                noise_schedule,
                annealing_schedule,
                jnp.full((B,), t, x.dtype),
                x,
                beta_c,
                debias=cfg.debias_inference,
                compute_weights=resampling_interval != -1,
                pin_energy=cfg.pin_energy,
                energy_function=target if cfg.pin_energy else None,
                divergence_mode=cfg.divergence_mode,
                divergence_chunk_size=cfg.divergence_chunk_size,
                divergence_tangent_chunk=cfg.divergence_tangent_chunk,
                hutchinson_probes=cfg.hutchinson_probes,
                hutchpp_rank=cfg.hutchpp_rank,
                divergence_key=k_div,
                clip_quantile=cfg.weight_clip_quantile,
                div_bt_override=div_override,
                score_backbone_fwd=score_backbone_fwd,
                energy_backbone_fwd=energy_backbone_fwd,
                pallas_divergence=cfg.pallas_divergence,
                pallas_divergence_block_b=cfg.pallas_divergence_block_b,
                pallas_tangent_chunk=cfg.pallas_tangent_chunk,
                pallas_interpret=cfg.pallas_interpret,
                divergence_g_kernel=cfg.divergence_g_kernel,
                g_rows_per_block=cfg.g_rows_per_block,
            )

        if cfg.divergence_update_interval <= 1 or resampling_interval == -1:
            terms = _terms(None)
        else:
            # recompute the divergence on schedule, reuse the carried value
            # otherwise (lax.cond: only the selected branch executes)
            terms = jax.lax.cond(rediv_f, lambda: _terms(None), lambda: _terms(div_c))
        div_new = terms.divergence if terms.divergence is not None else div_c
        g_t = noise_schedule.g(t)
        diffusion = cfg.diffusion_scale * g_t * jax.random.normal(k_diff, x.shape, x.dtype)
        x_next = x + terms.drift_X * dt + diffusion * jnp.sqrt(dt)
        # before the resampling window the prior samples must not move
        # (sde_integration.py:278-280)
        x_next = jnp.where(frz_f, x, x_next)
        x_next = maybe_mean_free(x_next)
        a_next = jnp.where(acc_f, a + terms.drift_A * dt, jnp.zeros_like(a))

        if cfg.ess_resampling_threshold is not None:
            # adaptive SMC: trigger only when the weights have degenerated
            from pita_tpu.metrics.ess import effective_sample_size

            ess = effective_sample_size(a_next, normalize=True)
            res_f = res_f & (ess < cfg.ess_resampling_threshold)

        # systematic resampling (sde_integration.py:292-296) under lax.cond:
        # non-resample steps skip the weight sort AND — on a mesh — the
        # full-state ancestor all-gather (measured: the gather is ~90% of the
        # per-step collective volume, scripts/measure_collectives.py), so
        # interval/ESS-triggered schedules only pay it when they fire
        def _do_resample(xv, av, dv):
            choice = systematic_resample(k_res, av)
            return (
                jnp.take(xv, choice, axis=0),
                count_unique(choice, B),
                jnp.zeros_like(av),
                # the carried divergence follows its chain through resampling
                jnp.take(dv, choice, axis=0),
            )

        def _skip_resample(xv, av, dv):
            return xv, jnp.asarray(B, jnp.int32), av, dv

        x_next, n_unique, a_next, div_new = jax.lax.cond(
            res_f, _do_resample, _skip_resample, x_next, a_next, div_new
        )

        stats = {
            "divergence": _std(terms.divergence),
            "cross_term": _std(terms.cross_term),
            "dUt_dt": _std(terms.dUt_dt),
        }
        return (x_next, a_next, div_new, k, ps_c, pe_c, beta_c), (a_next, n_unique, stats)

    key, k_scan = jax.random.split(key)
    beta_arr = jnp.asarray(beta, jnp.float32)
    init = (
        x1, jnp.zeros((B,), x1.dtype), jnp.zeros((B,), x1.dtype), k_scan,
        params_score, params_energy, beta_arr,
    )
    steps_np = np.arange(n)
    rediv = steps_np % max(cfg.divergence_update_interval, 1) == 0
    xs = (
        times,
        jnp.asarray(in_window),
        jnp.asarray(freeze),
        jnp.asarray(resample_f),
        jnp.asarray(rediv),
    )

    if cfg.segment_size is not None and cfg.segment_size < n:
        # host-level segmentation: run the scan in bounded dispatches (long
        # single executions can trip runtime watchdogs; segments also give
        # preemption points). One compiled segment fn serves all segments —
        # the per-step flag arrays are traced scan inputs, not constants —
        # and is cached across integrate_sde calls (params enter the compiled
        # fn through the carry closure, so the cache key includes their id).
        seg = cfg.segment_size

        cache_key = (
            _weak_key(score_wrapper, energy_wrapper, target),
            noise_schedule, annealing_schedule, cfg, resampling_interval, B, D,
        )
        run_segment = _SEGMENT_CACHE.get(cache_key)
        if run_segment is None:
            run_segment = jax.jit(lambda carry, xs_seg: jax.lax.scan(body, carry, xs_seg))
            if len(_SEGMENT_CACHE) > 64:
                _prune_dead(_SEGMENT_CACHE)
            _SEGMENT_CACHE[cache_key] = run_segment

        if compile_only:
            # the per-step flag arrays are traced scan inputs, so one segment
            # program serves every (resampling_interval, n) at this (cfg, B, D)
            # — lowering with abstract xs compiles exactly the executable the
            # real run will request (dt/times enter as constants from the SAME
            # cfg.num_integration_steps, so the HLO matches bit-for-bit)
            xs_abstract = jax.tree.map(
                lambda arr: jax.ShapeDtypeStruct((seg,) + arr.shape[1:], arr.dtype),
                xs,
            )
            run_segment.lower(init, xs_abstract).compile()
            return None

        carry = init
        lw_parts, nu_parts, stat_parts = [], [], []
        s0 = 0
        while s0 < n:
            s1 = min(s0 + seg, n)
            if s1 - s0 < seg:  # pad the ragged tail to reuse the compiled fn
                pad = seg - (s1 - s0)
                xs_seg = jax.tree.map(
                    lambda arr: jnp.concatenate(
                        [arr[s0:s1], jnp.zeros((pad,) + arr.shape[1:], arr.dtype)]
                    ),
                    xs,
                )
                # padded steps: freeze x and zero all flags so they are no-ops
                xs_seg = (
                    xs_seg[0],
                    xs_seg[1].at[s1 - s0 :].set(False),
                    xs_seg[2].at[s1 - s0 :].set(True),
                    xs_seg[3].at[s1 - s0 :].set(False),
                    xs_seg[4].at[s1 - s0 :].set(False),
                )
                carry, (lw, nu, st) = run_segment(carry, xs_seg)
                lw, nu = lw[: s1 - s0], nu[: s1 - s0]
                st = jax.tree.map(lambda v: v[: s1 - s0], st)
            else:
                xs_seg = jax.tree.map(lambda arr: arr[s0:s1], xs)
                carry, (lw, nu, st) = run_segment(carry, xs_seg)
            lw_parts.append(lw)
            nu_parts.append(nu)
            stat_parts.append(st)
            s0 = s1
        x, a = carry[0], carry[1]
        logweights = jnp.concatenate(lw_parts, axis=0)
        num_unique = jnp.concatenate(nu_parts, axis=0)
        term_stats = jax.tree.map(lambda *vs: jnp.concatenate(vs, axis=0), *stat_parts)
    else:
        carry, (logweights, num_unique, term_stats) = jax.lax.scan(body, init, xs)
        x, a = carry[0], carry[1]

    did_resampling = resampling_interval != -1 and resampling_interval < n
    if cfg.resample_at_end and did_resampling:
        # final resample against the true target with the learned energy as
        # the proposal log-density (sde_integration.py:158-184)
        t_end = times[min(cfg.end_resampling_step, n - 1)]
        key, k_end = jax.random.split(key)
        target_logprob = target.log_prob(x)
        tb = jnp.full((B,), t_end, x.dtype)
        model_energy = energy_wrapper.energy(
            params_energy, noise_schedule.h(tb), x, beta,
            **(dict(pin=True, t=tb, energy_function=target) if cfg.pin_energy else {}),
        )
        logq0 = -model_energy * annealing_schedule.gamma(tb)
        a_end = target_logprob - logq0 + a
        a_end = jnp.minimum(a_end, jnp.quantile(a_end, 0.9))
        choice = systematic_resample(k_end, a_end)
        x = jnp.take(x, choice, axis=0)
        logweights = jnp.concatenate([logweights, a_end[None]], axis=0)
        num_unique = jnp.concatenate([num_unique, count_unique(choice, B)[None]], axis=0)

    if cfg.num_negative_time_steps > 0:
        x = negative_time_descent(
            x,
            target,
            num_steps=cfg.num_negative_time_steps,
            dt=cfg.dt_negative_time,
            do_langevin=cfg.do_langevin,
            key=jax.random.fold_in(key, 1),
            mean_free=cfg.should_mean_free and getattr(target, "is_molecule", False),
        )

    acceptance = jnp.zeros((0,))
    if cfg.post_mcmc_steps > 0:
        x, acceptance = mala(
            jax.random.fold_in(key, 2),
            x,
            target,
            num_steps=cfg.post_mcmc_steps,
            dt_init=cfg.dt_negative_time,
            adaptive=cfg.adaptive_mcmc,
            mean_free=cfg.should_mean_free and getattr(target, "is_molecule", False),
        )

    return IntegrateResult(x, logweights, num_unique, term_stats, acceptance)


def _std(v):
    if v is None:
        return jnp.zeros(())
    return jnp.std(v)


def negative_time_descent(x, target, num_steps, dt, do_langevin, key, mean_free):
    """Plain gradient ascent on log p (optionally ULA) (sde_integration.py:353-360)."""
    n_part = getattr(target, "n_particles", 1)
    n_sdim = getattr(target, "n_spatial_dim", x.shape[-1])

    def body(carry, k):
        x = carry
        _, force = target.log_prob_and_force(x)
        x = x + force * dt
        if do_langevin:
            x = x + jax.random.normal(k, x.shape, x.dtype) * jnp.sqrt(2 * dt)
        if mean_free:
            x = remove_mean(x, n_part, n_sdim)
        return x, None

    keys = jax.random.split(key, num_steps)
    x, _ = jax.lax.scan(body, x, keys)
    return x


def mala(key, x, target, num_steps, dt_init, adaptive, mean_free, target_accept: float = 0.55):
    """Metropolis-adjusted Langevin refinement (sde_integration.py:362-470).

    Non-finite chains are frozen in place (the reference splits them out and
    re-concatenates, which permutes chain order; we preserve positions).
    Adaptive mode multiplies/divides the step size by 1.1 around the target
    acceptance rate (:437-446).
    """
    n_part = getattr(target, "n_particles", 1)
    n_sdim = getattr(target, "n_spatial_dim", x.shape[-1])
    lp, force = target.log_prob_and_force(x)
    valid = jnp.isfinite(lp)

    def body(carry, k):
        x, lp, force, dt = carry
        k_noise, k_acc = jax.random.split(k)
        noise = jax.random.normal(k_noise, x.shape, x.dtype)
        prop = x + 0.5 * dt * force + jnp.sqrt(dt) * noise
        lp_prop, force_prop = target.log_prob_and_force(prop)
        fwd_mean = x + 0.5 * dt * force
        bwd_mean = prop + 0.5 * dt * force_prop
        log_q_fwd = -jnp.sum((prop - fwd_mean) ** 2, axis=-1) / (2 * dt)
        log_q_bwd = -jnp.sum((x - bwd_mean) ** 2, axis=-1) / (2 * dt)
        log_ratio = (lp_prop - lp) + (log_q_bwd - log_q_fwd)
        accept = (jnp.log(jax.random.uniform(k_acc, lp.shape)) < log_ratio) & valid
        acc_rate = jnp.sum(accept & valid) / jnp.maximum(jnp.sum(valid), 1)
        x_new = jnp.where(accept[:, None], prop, x)
        if mean_free:
            x_new = jnp.where(valid[:, None], remove_mean(x_new, n_part, n_sdim), x_new)
        lp_new = jnp.where(accept, lp_prop, lp)
        force_new = jnp.where(accept[:, None], force_prop, force)
        if adaptive:
            dt = jnp.where(acc_rate > target_accept, dt * 1.1, dt / 1.1)
        return (x_new, lp_new, force_new, dt), acc_rate

    keys = jax.random.split(key, num_steps)
    (x, _, _, _), acc = jax.lax.scan(body, (x, lp, force, jnp.asarray(dt_init, x.dtype)), keys)
    return x, acc
