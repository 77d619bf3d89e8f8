"""MD generator, TICA, chirality, plotting (reference aux subsystems)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pita_tpu.targets.alp import ALPEnergy


@pytest.fixture(scope="module")
def aldp():
    return ALPEnergy("aldp", temperature=300.0)


@pytest.mark.slow
def test_langevin_md_conserves_sanity(aldp, rng):
    from pita_tpu.baselines.md import MDConfig, langevin_md

    x0 = jnp.tile(jnp.asarray(aldp.initial_structure())[None], (4, 1))
    cfg = MDConfig(temperature=300.0, dt=0.0005, n_steps=400, report_interval=100)
    res = langevin_md(rng, aldp, x0, cfg)
    assert res.positions.shape == (4, 4, aldp.dim)
    assert bool(jnp.isfinite(res.positions).all())
    # energies stay bounded (no explosion)
    assert float(jnp.max(res.potential_energies)) < 200.0


@pytest.mark.slow
def test_generate_md_dataset(aldp, tmp_path):
    from pita_tpu.baselines.md import generate_md_dataset

    out = generate_md_dataset(
        aldp, str(tmp_path / "traj.npz"), n_steps=200, n_replicas=2,
        checkpoint_every=200,
    )
    z = np.load(out)
    assert z["positions"].ndim == 3
    assert np.isfinite(z["energies"]).all()


def test_tica_recovers_slow_mode():
    """Synthetic data: dim0 slow AR(1), dim1 fast noise — TIC1 ≈ dim0."""
    from pita_tpu.metrics.tica import tica_fit

    rng = np.random.default_rng(0)
    T = 5000
    slow = np.zeros(T)
    for t in range(1, T):
        slow[t] = 0.99 * slow[t - 1] + 0.1 * rng.normal()
    fast = rng.normal(size=T)
    X = np.stack([slow, fast], -1)
    model = tica_fit(X, lagtime=10, dim=2)
    # leading component dominated by the slow coordinate
    c = np.abs(model.components[:, 0])
    assert c[0] > 5 * c[1]
    assert model.eigenvalues[0] > 0.8


def test_tica_features_and_run(aldp):
    from pita_tpu.metrics.tica import run_tica, tica_features

    x = np.tile(aldp.initial_structure()[None], (64, 1))
    x = x + np.random.default_rng(0).normal(0, 5e-3, x.shape)
    f = tica_features(aldp, x)
    assert f.shape[0] == 64 and f.shape[1] >= 4
    out = run_tica(aldp, x, generated=x[:32], lagtime=2)
    assert out["data_proj"].shape == (64, 2)
    assert out["generated_proj"].shape == (32, 2)


def test_chirality_detection_and_fix(aldp):
    from pita_tpu.utils.chirality import (
        bonds_from_distances,
        find_chirality_centers,
        chirality_sign,
        check_and_fix_chirality,
    )

    x = aldp.initial_structure().reshape(-1, 3)
    elements = [t[0] for t in aldp.topology["types"]]
    bonds = bonds_from_distances(x, elements)
    assert len(bonds) >= len(aldp.topology["bonds"]) - 2  # cutoffs find the graph
    centers = find_chirality_centers(aldp.topology["bonds"], elements)
    assert len(centers) == 1  # CA of the single ALA
    c, nbrs = centers[0]
    assert aldp.topology["names"][c] == "CA"
    ref = chirality_sign(x[None], c, nbrs)
    batch = np.stack([x, x * np.asarray([1, 1, -1.0])])  # second is mirrored
    fixed, flipped = check_and_fix_chirality(batch, centers, ref)
    assert flipped.tolist() == [False, True]
    s_fixed = chirality_sign(fixed, c, nbrs)
    assert (s_fixed == ref).all()


def test_plotting_functions_save_pngs(aldp, tmp_path, rng):
    from pita_tpu.io import plotting as P
    from pita_tpu.targets import GMM40

    g = np.random.default_rng(0).normal(size=500)
    d = np.random.default_rng(1).normal(size=500)
    assert P.plot_energy_histograms(g, d, str(tmp_path)).endswith(".png")
    gmm = GMM40()
    s = gmm.sample(rng, 256)
    assert P.plot_gmm_contours(gmm, s, str(tmp_path)).endswith(".png")
    phi = np.random.default_rng(2).uniform(-np.pi, np.pi, 300)
    psi = np.random.default_rng(3).uniform(-np.pi, np.pi, 300)
    assert P.plot_ramachandran(phi, psi, str(tmp_path)).endswith(".png")
    lw = np.random.default_rng(4).normal(size=(50, 64))
    assert P.plot_logweights(lw, str(tmp_path)).endswith(".png")
    assert P.plot_num_unique(np.arange(50), str(tmp_path)).endswith(".png")
    import os

    assert len([f for f in os.listdir(tmp_path) if f.endswith(".png")]) == 5


def test_emd_1d_unequal_exact():
    """Exact unequal-size 1D EMD: agrees with scipy W1 and the equal-size sort
    formula; used by the cropped energy distances after |E| masking."""
    from scipy.stats import wasserstein_distance

    from pita_tpu.metrics.distances import emd_1d_unequal, emd2_1d

    rng = np.random.default_rng(0)
    a = rng.normal(size=301)
    b = rng.normal(loc=0.3, size=517)
    w1 = emd_1d_unequal(a, b, p=1)
    np.testing.assert_allclose(w1, wasserstein_distance(a, b), rtol=1e-10)
    # equal sizes: reduces to the sorted-pairing formula
    c, d = rng.normal(size=200), rng.normal(size=200)
    np.testing.assert_allclose(
        emd_1d_unequal(c, d, p=2), float(emd2_1d(jnp.asarray(c), jnp.asarray(d))), rtol=1e-5
    )


def test_energy_distances_cropped_unequal_masks():
    """Masking that drops different fractions must not truncate quantiles."""
    from pita_tpu.metrics.distances import energy_distances

    rng = np.random.default_rng(1)
    g = np.concatenate([rng.normal(size=500), np.full(500, 5000.0)])  # half masked
    d = rng.normal(size=1000)  # none masked
    out = energy_distances(jnp.asarray(g), jnp.asarray(d), prefix="t")
    # the cropped metric compares the same (standard-normal) distribution
    assert out["t/energy_w2_cropped"] < 0.25
    # the uncropped metric is blown up by the outliers
    assert out["t/energy_w2"] > 100
