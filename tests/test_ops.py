"""Resampling and divergence op correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from pita_tpu.ops import systematic_resample, count_unique, exact_divergence, exact_laplacian
from pita_tpu.ops.divergence import hutchinson_divergence


def test_systematic_resample_uniform_weights(rng):
    """Uniform weights ⇒ every ancestor chosen exactly once."""
    B = 64
    idx = systematic_resample(rng, jnp.zeros(B))
    assert sorted(np.asarray(idx).tolist()) == list(range(B))


def test_systematic_resample_concentrated(rng):
    """A dominant weight takes (almost) all slots."""
    B = 32
    lw = jnp.full((B,), -100.0).at[7].set(0.0)
    idx = systematic_resample(rng, lw)
    # softmax clipping at 1e-6 leaves negligible mass elsewhere
    assert np.mean(np.asarray(idx) == 7) > 0.95


def test_systematic_resample_matches_multinomial_marginals(rng):
    """Ancestor counts ∝ normalized weights."""
    B = 1024
    lw = jnp.log(jnp.arange(1, B + 1, dtype=jnp.float32))
    counts = np.zeros(B)
    for i in range(20):
        idx = systematic_resample(jax.random.fold_in(rng, i), lw)
        counts += np.bincount(np.asarray(idx), minlength=B)
    w = np.asarray(jax.nn.softmax(lw))
    np.testing.assert_allclose(counts / counts.sum(), w, atol=6e-4)


def test_count_unique(rng):
    idx = jnp.asarray([0, 0, 3, 5, 5, 5, 7])
    assert int(count_unique(idx, 10)) == 4


def test_exact_divergence_linear_field(rng):
    """div(Ax) = tr(A)."""
    A = jax.random.normal(rng, (5, 5))

    def f(t, x):
        return x @ A.T

    t = jnp.zeros(3)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (3, 5))
    div = exact_divergence(f, t, x)
    np.testing.assert_allclose(div, jnp.trace(A) * jnp.ones(3), rtol=5e-3)


def test_exact_laplacian_quadratic(rng):
    """lap(0.5·||x||²·c) = c·d."""

    def u(t, x):
        return 0.5 * 3.0 * jnp.sum(x**2, axis=-1)

    x = jax.random.normal(rng, (4, 7))
    lap = exact_laplacian(u, jnp.zeros(4), x)
    np.testing.assert_allclose(lap, 21.0 * jnp.ones(4), rtol=1e-5)


def test_hutchinson_matches_exact_in_expectation(rng):
    A = jax.random.normal(rng, (6, 6))

    def f(t, x):
        return x @ A.T

    t = jnp.zeros(8)
    x = jax.random.normal(jax.random.fold_in(rng, 2), (8, 6))
    est = hutchinson_divergence(f, t, x, jax.random.fold_in(rng, 3), num_probes=512)
    np.testing.assert_allclose(est, jnp.trace(A) * jnp.ones(8), rtol=0.15)


def test_qmc_resample_marginals(rng):
    from pita_tpu.ops.resampling import qmc_resample

    B = 512
    lw = jnp.log(jnp.arange(1, B + 1, dtype=jnp.float32))
    counts = np.zeros(B)
    for i in range(10):
        idx = qmc_resample(jax.random.fold_in(rng, i), lw)
        counts += np.bincount(np.asarray(idx), minlength=B)
    w = np.asarray(jax.nn.softmax(lw))
    np.testing.assert_allclose(counts / counts.sum(), w, atol=1e-3)


def test_birth_death_resample(rng):
    from pita_tpu.ops.resampling import birth_death_resample

    B = 64
    birth = jnp.ones(B).at[5].set(100.0)
    death = jnp.zeros(B).at[jnp.asarray([1, 2])].set(10.0)  # clocks expired
    thresh = jnp.ones(B)
    ids, b2, d2, t2, n_killed = birth_death_resample(rng, birth, death, thresh)
    assert int(n_killed) == 2
    ids = np.asarray(ids)
    # survivors keep their identity
    alive = [i for i in range(B) if i not in (1, 2)]
    assert all(ids[i] == i for i in alive)
    # killed chains were replaced (mostly by the dominant birth weight)
    assert ids[1] != 1 or ids[2] != 2
    np.testing.assert_allclose(np.asarray(d2)[[1, 2]], 0.0)
