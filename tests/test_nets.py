"""Network correctness: EDM preconditioning identities, EGNN equivariance, EMA."""

import jax
import jax.numpy as jnp
import numpy as np

from pita_tpu.nets import MLPBackbone, EGNNBackbone, ScoreWrapper, EnergyWrapper
from pita_tpu.nets.ema import ema_init, ema_update


def _mlp_score(rng, dim=4):
    net = MLPBackbone(out_dim=dim, hidden_size=32, hidden_layers=2, emb_size=16)
    sw = ScoreWrapper(net)
    params = sw.init(rng, dim)
    return sw, params


def test_score_denoiser_shapes(rng):
    sw, params = _mlp_score(rng)
    ht = jnp.full((6,), 0.5)
    xt = jax.random.normal(rng, (6, 4))
    D, s = sw.denoiser(params, ht, xt, 1.0, return_score=True)
    assert D.shape == (6, 4) and s.shape == (6, 4)
    np.testing.assert_allclose(s, (D - xt) / 0.5, rtol=1e-5)


def test_energy_score_consistency(rng):
    """EnergyWrapper score == ∇_x E and denoiser == x - h·∇E (energy_net.py:51-66)."""
    net = MLPBackbone(out_dim=4, hidden_size=32, hidden_layers=2, emb_size=16)
    ew = EnergyWrapper(net)
    params = ew.init(rng, 4)
    ht = jnp.full((5,), 0.3)
    xt = jax.random.normal(rng, (5, 4))
    E = ew.energy(params, ht, xt, 1.0)
    assert E.shape == (5,)
    g = ew.grad_x(params, ht, xt, 1.0)
    gd = jax.vmap(
        jax.grad(lambda xi: ew.energy(params, jnp.full((1,), 0.3), xi[None], 1.0)[0])
    )(xt)
    np.testing.assert_allclose(g, gd, rtol=1e-4, atol=1e-6)
    D = ew.denoiser(params, ht, xt, 1.0)
    np.testing.assert_allclose(D, xt - 0.3 * g, rtol=1e-5)


def test_energy_denoiser_and_energy_joint_grads(rng):
    net = MLPBackbone(out_dim=4, hidden_size=32, hidden_layers=2, emb_size=16)
    ew = EnergyWrapper(net)
    params = ew.init(rng, 4)
    ht = jnp.linspace(0.2, 0.8, 5)
    xt = jax.random.normal(rng, (5, 4))
    D, dU_dh, U = ew.denoiser_and_energy(params, ht, xt, 1.0)
    np.testing.assert_allclose(U, ew.energy(params, ht, xt, 1.0), rtol=1e-5)
    # dU/dh by finite differences
    eps = 1e-3
    U_p = ew.energy(params, ht + eps, xt, 1.0)
    U_m = ew.energy(params, ht - eps, xt, 1.0)
    np.testing.assert_allclose(dU_dh, (U_p - U_m) / (2 * eps), rtol=2e-2, atol=1e-3)


def test_energy_pinning_at_t0(rng):
    """pin=True at t=0 must return the clamped true energy (energy_net.py:43-48)."""
    from pita_tpu.targets import GMM40

    gmm = GMM40()
    net = MLPBackbone(out_dim=2, hidden_size=32, hidden_layers=2, emb_size=16)
    ew = EnergyWrapper(net)
    params = ew.init(rng, 2)
    xt = jax.random.normal(rng, (4, 2)) * 10
    ht = jnp.full((4,), 0.01)
    t0 = jnp.zeros((4,))
    E = ew.energy(params, ht, xt, 1.0, pin=True, t=t0, energy_function=gmm)
    np.testing.assert_allclose(E, jnp.clip(-gmm.log_prob(xt), -1e3, 1e3), rtol=1e-5)


def _random_rotation(key, d=3):
    m = jax.random.normal(key, (d, d))
    q, r = jnp.linalg.qr(m)
    return q * jnp.sign(jnp.diagonal(r))


def test_egnn_equivariance(rng):
    """EGNN output displacement must rotate with the input (E(3) equivariance)."""
    N, D = 5, 3
    net = EGNNBackbone(n_particles=N, n_spatial_dim=D, hidden_nf=16, n_layers=2)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, (2, N * D))
    params = net.init(k2, jnp.zeros(2), x, jnp.ones(2))
    R = _random_rotation(k3)
    t = jnp.full((2,), 0.3)
    out = net.apply(params, t, x, 1.0).reshape(2, N, D)
    x_rot = (x.reshape(2, N, D) @ R.T).reshape(2, N * D)
    out_rot = net.apply(params, t, x_rot, 1.0).reshape(2, N, D)
    # exact in f64 (err ~4e-15); f32 rounding is amplified by tanh·coords_range
    np.testing.assert_allclose(out @ R.T, out_rot, atol=5e-3)


def test_egnn_permutation_equivariance(rng):
    N, D = 6, 3
    net = EGNNBackbone(n_particles=N, n_spatial_dim=D, hidden_nf=16, n_layers=2)
    x = jax.random.normal(rng, (1, N * D))
    params = net.init(jax.random.fold_in(rng, 1), jnp.zeros(1), x, jnp.ones(1))
    perm = np.asarray([3, 1, 4, 0, 5, 2])
    t = jnp.full((1,), 0.5)
    out = net.apply(params, t, x, 1.0).reshape(1, N, D)
    xp = x.reshape(1, N, D)[:, perm].reshape(1, N * D)
    out_p = net.apply(params, t, xp, 1.0).reshape(1, N, D)
    np.testing.assert_allclose(out[:, perm], out_p, rtol=1e-4, atol=1e-6)


def test_egnn_output_mean_free(rng):
    N, D = 5, 3
    net = EGNNBackbone(n_particles=N, n_spatial_dim=D, hidden_nf=16, n_layers=2)
    x = jax.random.normal(rng, (3, N * D))
    params = net.init(jax.random.fold_in(rng, 1), jnp.zeros(3), x, jnp.ones(3))
    out = net.apply(params, jnp.full((3,), 0.2), x, 1.0).reshape(3, N, D)
    np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-6)


def test_ema_warmup_and_convergence():
    params = {"w": jnp.zeros(3)}
    ema = ema_init(params)
    new = {"w": jnp.ones(3)}
    # first update: decay = min(0.999, 2/11)
    ema = ema_update(ema, new, decay=0.999)
    expected = 2.0 / 11.0 * 0.0 + (1 - 2.0 / 11.0) * 1.0
    np.testing.assert_allclose(ema.params["w"], expected, rtol=1e-6)
    for _ in range(200):
        ema = ema_update(ema, new, decay=0.999)
    assert float(jnp.abs(ema.params["w"] - 1.0).max()) < 0.05


def test_wrappers_factorized_forward_matches_flax(rng):
    """Wrapper outputs are unchanged by the factorized-EGNN routing."""
    from pita_tpu.nets import EGNNBackbone, ScoreWrapper, EnergyWrapper
    from pita_tpu.nets import precondition as P

    bb = EGNNBackbone(n_particles=5, n_spatial_dim=3, hidden_nf=16, n_layers=2)
    score, energy = ScoreWrapper(bb), EnergyWrapper(bb)
    ps = score.init(rng, 15)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (4, 15))
    ht = jnp.full((4,), 0.3)
    d_fast = score.denoiser(ps, ht, x, 1.0)
    e_fast = energy.energy(ps, ht, x, 1.0)
    g_fast = energy.grad_x(ps, ht, x, 1.0)
    orig = P._apply_backbone
    try:
        P._apply_backbone = lambda bb, p, t, xx, b: bb.apply(p, t, xx, b)
        d_ref = score.denoiser(ps, ht, x, 1.0)
        e_ref = energy.energy(ps, ht, x, 1.0)
        g_ref = energy.grad_x(ps, ht, x, 1.0)
    finally:
        P._apply_backbone = orig
    np.testing.assert_allclose(np.asarray(d_fast), np.asarray(d_ref), rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(e_fast), np.asarray(e_ref), rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref), rtol=2e-3, atol=2e-3)
