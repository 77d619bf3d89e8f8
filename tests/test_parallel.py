"""Mesh-sharded sampling and data-parallel training on 8 virtual CPU devices
(the reference simulates DDP with 2 CPU processes, test_train.py:64-76; here a
single SPMD program over an 8-device mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pita_tpu.nets import MLPBackbone, ScoreWrapper, EnergyWrapper
from pita_tpu.parallel import make_mesh, sharded_integrate, make_dp_train_step, shard_batch
from pita_tpu.sampler import IntegratorConfig, integrate_sde
from pita_tpu.schedules import ElucidatingNoiseSchedule, ConstantAnnealingSchedule
from pita_tpu.targets import GMM40
from pita_tpu.train.losses import LossConfig

from tests.test_sampler import AnalyticScore, AnalyticEnergy, GaussianTarget, SIGMA0_SQ, SCHED


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_integrate_matches_single_device(rng):
    """Chains sharded over 8 devices must produce bit-comparable samples to the
    unsharded run (replicated resampling key ⇒ identical ancestor choice)."""
    mesh = make_mesh(8, axis_name="chains")
    cfg = IntegratorConfig(
        num_integration_steps=40, end_resampling_step=36,
        resampling_interval=4, resample_at_end=True,
    )
    anneal = ConstantAnnealingSchedule(annealing_factor=2.0)
    scale = float(np.sqrt(SCHED.h(jnp.asarray(1.0)) / 2.0))
    k_prior, k_int = jax.random.split(rng)
    x1 = jax.random.normal(k_prior, (256, 2)) * scale

    res_single = integrate_sde(
        k_int, x1, AnalyticScore(), AnalyticEnergy(), {}, {},
        SCHED, anneal, GaussianTarget(), 1.0, cfg,
    )
    res_sharded = sharded_integrate(
        mesh, k_int, x1, AnalyticScore(), AnalyticEnergy(), {}, {},
        SCHED, anneal, GaussianTarget(), 1.0, cfg,
    )
    np.testing.assert_allclose(
        np.asarray(res_single.samples), np.asarray(res_sharded.samples),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(res_single.num_unique), np.asarray(res_sharded.num_unique)
    )


def test_sharded_integrate_rejects_indivisible_batch(rng):
    mesh = make_mesh(8)
    cfg = IntegratorConfig(num_integration_steps=4, end_resampling_step=4)
    with pytest.raises(AssertionError):
        sharded_integrate(
            mesh, rng, jnp.zeros((30, 2)), AnalyticScore(), AnalyticEnergy(),
            {}, {}, SCHED, ConstantAnnealingSchedule(), GaussianTarget(), 1.0, cfg,
        )


def test_dp_train_step_matches_single_device(rng):
    """Gradient psum from sharding == single-device gradients."""
    gmm = GMM40()
    sw = ScoreWrapper(MLPBackbone(out_dim=2, hidden_size=32, hidden_layers=2, emb_size=16))
    ew = EnergyWrapper(MLPBackbone(out_dim=2, hidden_size=32, hidden_layers=2, emb_size=16))
    ps = sw.init(rng, 2)
    pe = ew.init(jax.random.fold_in(rng, 1), 2)
    sched = ElucidatingNoiseSchedule(sigma_min=0.01, sigma_max=10.0, rho=7.0)
    loss_cfg = LossConfig()
    opt = optax.adam(1e-3)
    opt_state = opt.init((ps, pe))

    x0 = gmm.sample(jax.random.fold_in(rng, 2), 64)
    e0, f0 = gmm.log_prob_and_force(x0)
    k_loss = jax.random.fold_in(rng, 3)
    beta = jnp.asarray(1.0)

    mesh = make_mesh(8, axis_name="dp")
    dp_step = make_dp_train_step(mesh, sw, ew, sched, loss_cfg, opt)
    ps_dp, pe_dp, _, aux_dp = dp_step(ps, pe, opt_state, k_loss, x0, e0, f0, beta)

    # single-device reference
    from pita_tpu.train.losses import compute_losses

    def loss_fn(both):
        a, b = both
        return compute_losses(sw, ew, a, b, sched, loss_cfg, k_loss, x0, e0, f0, beta)

    (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)((ps, pe))
    updates, _ = opt.update(grads, opt_state, (ps, pe))
    ps_ref, pe_ref = optax.apply_updates((ps, pe), updates)

    flat_dp = jax.tree_util.tree_leaves(ps_dp)
    flat_ref = jax.tree_util.tree_leaves(ps_ref)
    for a, b in zip(flat_dp, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-6)
    np.testing.assert_allclose(float(aux_dp["loss"]), float(aux["loss"]), rtol=1e-3)


def test_shard_batch_places_on_mesh(rng):
    mesh = make_mesh(8)
    x = jnp.zeros((64, 4))
    xs = shard_batch(mesh, x)
    assert len(xs.sharding.device_set) == 8


def test_sharded_buffer_matches_single_device(rng):
    """Buffer rows sharded over 8 devices: identical add/sample semantics to
    the single-device ring buffer (replicated PRNG key), state actually
    split (capacity/8 rows per device shard)."""
    from pita_tpu.parallel import ShardedBufferOps
    from pita_tpu.train.buffer import buffer_add, buffer_init, buffer_sample

    mesh = make_mesh(8)
    ops = ShardedBufferOps(mesh)
    cap, dim = 512, 6

    ref = buffer_init(cap, dim)
    shb = ops.place(buffer_init(cap, dim))
    for r in range(3):
        k = jax.random.fold_in(rng, r)
        x = jax.random.normal(k, (100, dim))
        e = jax.random.normal(jax.random.fold_in(k, 1), (100,))
        f = jax.random.normal(jax.random.fold_in(k, 2), (100, dim))
        mask = e < 0.5
        ref = buffer_add(ref, x, e, f, mask=mask)
        shb = ops.add(shb, x, e, f, mask=mask)

    # state is actually sharded: each device holds capacity/8 rows
    shard_rows = {s.data.shape[0] for s in shb.x.addressable_shards}
    assert shard_rows == {cap // 8}
    np.testing.assert_array_equal(np.asarray(ref.pos), np.asarray(shb.pos))
    np.testing.assert_array_equal(np.asarray(ref.size), np.asarray(shb.size))
    np.testing.assert_allclose(np.asarray(ref.x), np.asarray(shb.x), rtol=1e-6)

    k_s = jax.random.fold_in(rng, 99)
    for prioritize, replacement in [(False, True), (False, False), (True, False)]:
        xs_r, es_r, fs_r, idx_r = buffer_sample(
            ref, k_s, 64, prioritize=prioritize, replacement=replacement
        )
        xs_s, es_s, fs_s, idx_s = ops.sample(
            shb, k_s, 64, prioritize=prioritize, replacement=replacement
        )
        np.testing.assert_array_equal(np.asarray(idx_r), np.asarray(idx_s))
        np.testing.assert_allclose(np.asarray(xs_r), np.asarray(xs_s), rtol=1e-6)
