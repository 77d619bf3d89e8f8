"""FAB closure: RealNVP flow, FABModel losses, prioritised-buffer training,
internal-coordinate KLD eval (fab/fab/core.py, train_with_prioritised_buffer,
utils/aldp.py parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pita_tpu.fab.fab_model import (
    FABConfig,
    LOSS_TYPES,
    fab_loss,
    train_fab,
    train_fab_with_prioritised_buffer,
)
from pita_tpu.fab.flow import FlowDistribution


def test_flow_inverse_consistency(rng):
    flow = FlowDistribution(dim=4, n_coupling=4, hidden=16)
    params = flow.init(rng)
    x, log_q = flow.sample_and_log_prob(params, jax.random.fold_in(rng, 1), 32)
    log_q2 = flow.log_prob(params, x)
    np.testing.assert_allclose(np.asarray(log_q), np.asarray(log_q2), rtol=1e-4, atol=1e-4)


def test_flow_log_prob_integrates_to_one(rng):
    # zero-init flow == standard normal
    flow = FlowDistribution(dim=2, n_coupling=2, hidden=8)
    params = flow.init(rng)
    x = jax.random.normal(jax.random.fold_in(rng, 2), (16, 2))
    ref = -0.5 * jnp.sum(x**2, -1) - jnp.log(2 * jnp.pi)
    np.testing.assert_allclose(np.asarray(flow.log_prob(params, x)), np.asarray(ref), rtol=1e-5)


def _gauss_target(mean=1.5, scale=0.7):
    def log_prob(x):
        return -0.5 * jnp.sum(((x - mean) / scale) ** 2, -1) - x.shape[-1] * (
            0.5 * jnp.log(2 * jnp.pi) + jnp.log(scale)
        )

    return log_prob


@pytest.mark.parametrize("loss_type", [lt for lt in LOSS_TYPES if "forward_kl" not in lt])
def test_all_losses_finite_and_differentiable(loss_type, rng):
    flow = FlowDistribution(dim=2, n_coupling=2, hidden=8)
    params = flow.init(rng)
    cfg = FABConfig(loss_type=loss_type, batch_size=32,
                    n_intermediate_distributions=2)
    loss, grads = jax.value_and_grad(
        lambda p: fab_loss(flow, p, _gauss_target(), jax.random.fold_in(rng, 3), cfg)
    )(params)
    assert np.isfinite(float(loss))
    gnorm = float(jax.tree.reduce(lambda a, b: a + jnp.sum(b**2), grads, 0.0))
    assert np.isfinite(gnorm) and gnorm > 0


@pytest.mark.slow
def test_train_fab_learns_gaussian(rng):
    flow = FlowDistribution(dim=2, n_coupling=4, hidden=32)
    target = _gauss_target(mean=1.0, scale=0.5)
    cfg = FABConfig(loss_type="fab_alpha_div", batch_size=128, lr=5e-3,
                    n_intermediate_distributions=2)
    params, losses = train_fab(flow, target, cfg, rng, n_iterations=150)
    x = flow.sample(params, jax.random.fold_in(rng, 9), 2000)
    m = np.asarray(x).mean(0)
    s = np.asarray(x).std(0)
    np.testing.assert_allclose(m, 1.0, atol=0.15)
    np.testing.assert_allclose(s, 0.5, atol=0.15)


@pytest.mark.slow
def test_train_fab_prioritised_buffer_learns(rng):
    flow = FlowDistribution(dim=2, n_coupling=4, hidden=32)
    target = _gauss_target(mean=-1.0, scale=0.6)
    cfg = FABConfig(batch_size=128, lr=5e-3, n_intermediate_distributions=2,
                    min_buffer_length=128, n_batches_buffer_sampling=4)
    params, buf, hist = train_fab_with_prioritised_buffer(
        flow, target, cfg, rng, n_iterations=60
    )
    assert len(hist) > 0 and np.isfinite(hist[-1]["loss"])
    x = flow.sample(params, jax.random.fold_in(rng, 9), 2000)
    np.testing.assert_allclose(np.asarray(x).mean(0), -1.0, atol=0.2)


def test_internal_coord_kld_zero_for_same_dist():
    from pita_tpu.metrics.internal_coords import evaluate_internal_coords
    from pita_tpu.targets.alp import ALPEnergy

    t = ALPEnergy("aldp")
    x0 = t.initial_structure().reshape(1, -1)
    rng = np.random.default_rng(0)
    a = x0 + rng.normal(size=(800, t.dim)) * 0.003
    b = x0 + rng.normal(size=(800, t.dim)) * 0.003
    m_same = evaluate_internal_coords(t, a, b, prefix="ic")
    assert m_same["ic/kld_mean"] < 0.5
    # a genuinely different distribution scores much worse
    c = x0 + rng.normal(size=(800, t.dim)) * 0.012
    m_diff = evaluate_internal_coords(t, c, b, prefix="ic")
    assert m_diff["ic/kld_mean"] > 2 * m_same["ic/kld_mean"]


def test_internal_coord_kld_empty_samples_skips():
    # chirality correction can reject every generated sample early in
    # training; the IC evaluation must skip, not crash (al3 debug=short
    # regression: reshape of size-0 array)
    from pita_tpu.metrics.internal_coords import evaluate_internal_coords
    from pita_tpu.targets.alp import ALPEnergy

    t = ALPEnergy("aldp")
    x0 = t.initial_structure().reshape(1, -1)
    rng = np.random.default_rng(0)
    b = x0 + rng.normal(size=(64, t.dim)) * 0.003
    empty = np.zeros((0, t.dim))
    assert evaluate_internal_coords(t, empty, b, prefix="ic") == {}
    assert evaluate_internal_coords(t, b, empty, prefix="ic") == {}
