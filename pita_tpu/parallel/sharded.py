"""Sharded sampling and data-parallel training.

Replaces the reference's DDP plumbing (§2.9): instead of rank-sliced Python
loops with a Lightning ``all_gather`` after every Euler–Maruyama step
(sde_integration.py:227-258), the whole integrator is jitted once with
sharding annotations — chains live sharded in HBM across the mesh for the
entire run; XLA inserts exactly the collectives the program needs:

- the per-step softmax/cumsum over the *global* weight vector → one
  ``all_gather`` of B floats (not B×D chain state),
- the post-resample ancestor gather ``x[choice]`` → a collective gather that
  rides ICI,
- nothing else crosses devices.

Determinism across devices is free: the resampling PRNG key is replicated, so
every device computes the same ancestor choice (the bit-determinism the
reference gets by replicating all state).

Data-parallel training likewise: shard the batch, keep parameters replicated,
and the gradient mean over the global batch becomes an XLA ``psum`` — the
replacement for DDP's NCCL all-reduce + ``sync_dist`` metric reduction.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pita_tpu.sampler.integrator import IntegratorConfig, integrate_sde


def shard_batch(mesh, x, axis_name: Optional[str] = None):
    """Place the leading axis of ``x`` (a pytree) on the mesh."""
    axis_name = axis_name or mesh.axis_names[0]
    sh = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda a: jax.device_put(a, sh), x)


def sharded_integrate(
    mesh,
    key,
    x1,
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
):
    """Run ``integrate_sde`` with chains sharded over the mesh.

    The chain batch must divide the mesh size. Parameters and the PRNG key are
    replicated; diagnostics come back replicated (they are global reductions).
    """
    n_dev = mesh.size
    assert x1.shape[0] % n_dev == 0, (
        f"chain batch {x1.shape[0]} must divide mesh size {n_dev} "
        "(the reference silently drops remainder chains, sde_integration.py:227-233 "
        "— we refuse instead)"
    )
    if cfg.segment_size is not None:
        # segmentation is a host-level loop; under this outer jit it would
        # unroll into one giant program — run unsegmented here (sharded runs
        # are per-device shorter anyway)
        cfg = cfg.replace(segment_size=None)
    chains = NamedSharding(mesh, P(mesh.axis_names[0]))
    repl = NamedSharding(mesh, P())

    fn = functools.partial(
        integrate_sde,
        score_wrapper=score_wrapper,
        energy_wrapper=energy_wrapper,
        noise_schedule=noise_schedule,
        annealing_schedule=annealing_schedule,
        target=target,
        cfg=cfg,
        resampling_interval=resampling_interval,
    )

    @functools.partial(
        jax.jit,
        in_shardings=(repl, chains, repl, repl, repl),
        out_shardings=None,
    )
    def run(key, x1, ps, pe, beta):
        return fn(key, x1, params_score=ps, params_energy=pe, beta=beta)

    x1 = jax.device_put(x1, chains)
    return run(key, x1, params_score, params_energy, jnp.asarray(beta, jnp.float32))


def make_dp_train_step(
    mesh,
    score_wrapper,
    energy_wrapper,
    noise_schedule,
    loss_cfg,
    optimizer,
    n_particles: int = 1,
    n_spatial_dim: int = 1,
    mean_free: bool = False,
    target=None,
):
    """Build a jitted data-parallel train step: batch sharded, params replicated.

    The gradient all-reduce is implicit in the sharding propagation (the loss
    is a mean over the global batch) — DDP-grad-sync parity with zero
    communication code.
    """
    from pita_tpu.train.losses import compute_losses
    import optax

    dp = NamedSharding(mesh, P(mesh.axis_names[0]))
    repl = NamedSharding(mesh, P())

    def step(params_s, params_e, opt_state, key, x0, e0, f0, beta):
        def loss_fn(both):
            ps, pe = both
            return compute_losses(
                score_wrapper, energy_wrapper, ps, pe, noise_schedule, loss_cfg,
                key, x0, e0, f0, beta,
                target=target, n_particles=n_particles,
                n_spatial_dim=n_spatial_dim, mean_free=mean_free,
            )

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            (params_s, params_e)
        )
        updates, opt_state = optimizer.update(grads, opt_state, (params_s, params_e))
        params_s, params_e = optax.apply_updates((params_s, params_e), updates)
        scalar_aux = {
            k: v for k, v in aux.items()
            if not k.endswith("per_sample") and k != "ln_sigma"
        }
        return params_s, params_e, opt_state, scalar_aux

    return jax.jit(
        step,
        in_shardings=(repl, repl, repl, repl, dp, dp, dp, repl),
    )
