"""JAX force field for alanine peptides (reference alp_energy.py capability:
OpenMM amber+OBC replaced by a self-contained jnp force field)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pita_tpu.targets.alp import ALPEnergy, build_peptide_topology, PEPTIDES
from pita_tpu.targets.forcefield import dihedral_angles


def test_topology_counts():
    for pep, n_ala in PEPTIDES.items():
        topo = build_peptide_topology(n_ala)
        assert len(topo["types"]) == 6 + 10 * n_ala + 6
        # net charge is zero (amber residue templates are neutral)
        np.testing.assert_allclose(topo["charges"].sum(), 0.0, atol=1e-6)
        assert topo["phi_idx"].shape == (n_ala, 4)
        assert topo["psi_idx"].shape == (n_ala, 4)


def test_aldp_energy_and_forces(rng):
    alp = ALPEnergy("aldp", temperature=300.0)
    x0 = jnp.asarray(alp.initial_structure())[None]
    e = float(alp.energy_kcal(x0)[0])
    assert -100 < e < 50, f"minimized aldp energy {e} kcal/mol out of range"
    lp, f = alp.log_prob_and_force(x0)
    assert np.isfinite(float(lp[0]))
    assert bool(jnp.isfinite(f).all())
    # force is the gradient of log_prob
    g = jax.grad(lambda x: alp.log_prob(x[None])[0])(x0[0])
    np.testing.assert_allclose(np.asarray(f[0]), np.asarray(g), rtol=1e-3, atol=1e-2)


def test_temperature_scaling(rng):
    a300 = ALPEnergy("aldp", temperature=300.0)
    a600 = ALPEnergy("aldp", temperature=600.0)
    x = jnp.asarray(a300.initial_structure())[None]
    np.testing.assert_allclose(
        a300.log_prob(x) / 2.0, a600.log_prob(x), rtol=1e-5
    )


def test_bonded_minimum_geometry():
    """Minimized structure sits near the force-field bond/angle minima."""
    alp = ALPEnergy("aldp")
    x = np.asarray(alp.initial_structure()).reshape(-1, 3) * 10.0  # Å
    bi = np.asarray(alp.params.bond_idx)
    r = np.linalg.norm(x[bi[:, 0]] - x[bi[:, 1]], axis=-1)
    np.testing.assert_allclose(r, np.asarray(alp.params.bond_r0), atol=0.05)


def test_dihedrals_shape_and_range(rng):
    alp = ALPEnergy("al3")
    x = jnp.asarray(alp.initial_structure())[None]
    phi, psi = alp.dihedrals(x)
    assert phi.shape == (1, 2) and psi.shape == (1, 2)
    assert bool(jnp.all(jnp.abs(phi) <= np.pi + 1e-5))


def test_dihedral_function_closed_form():
    """Four points in known geometry: dihedral = ±90°."""
    x = jnp.asarray(
        [[[0.0, 1.0, 0.0], [0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [1.0, 0.0, 1.0]]]
    )
    d = dihedral_angles(x, np.asarray([[0, 1, 2, 3]]))
    np.testing.assert_allclose(np.abs(np.rad2deg(np.asarray(d)))[0, 0], 90.0, atol=1e-4)


@pytest.mark.slow
def test_mala_sampling_is_stable(rng):
    """Short MALA run from the minimum stays finite and bounded — the
    ground-truth-data capability of sampling/sample_lj*.py for peptides."""
    from pita_tpu.baselines.mcmc import mala_chain

    alp = ALPEnergy("aldp", temperature=600.0)
    x0 = jnp.tile(jnp.asarray(alp.initial_structure())[None], (16, 1))
    x0 = x0 + jax.random.normal(rng, x0.shape) * 1e-3
    x, accs, dt = mala_chain(alp.log_prob_and_force, x0, rng, 300, dt=1e-7)
    assert bool(jnp.isfinite(x).all())
    assert float(accs[-50:].mean()) > 0.3
    e = alp.energy_kcal(x)
    assert float(jnp.max(e)) < 500.0


def test_peptide_assets_are_L_enantiomers():
    """L-amino acids have φ < 0 in relaxed conformations; the shipped
    structures must be the L-enantiomer (the force field is achiral — the
    starting structure selects the physical species; validated by MD
    Ramachandran basin occupancy, docs/aldp_ramachandran_md400K.png)."""
    for pep in ["aldp", "al3", "al4"]:
        alp = ALPEnergy(pep)
        x = jnp.asarray(alp.initial_structure())[None]
        phi, _ = alp.dihedrals(x)
        assert bool(jnp.all(phi < 0)), f"{pep}: phi {np.rad2deg(np.asarray(phi))}"


def test_log_on_epoch_end_peptide_metrics(tmp_path):
    """The eval hook must log Ramachandran distances, torus-W, chirality
    rates and TICA distances, and write figures (alp_energy.py:190-291)."""
    target = ALPEnergy("aldp", temperature=300.0)
    x0 = target.initial_structure().reshape(1, -1)
    rng = np.random.default_rng(0)
    data = x0 + rng.normal(size=(64, target.dim)) * 0.002
    samples = x0 + rng.normal(size=(48, target.dim)) * 0.002
    # mirror a few samples to exercise the chirality fix
    xr = samples.reshape(-1, target.n_particles, 3).copy()
    xr[:5, :, 2] *= -1.0
    samples = xr.reshape(-1, target.dim)
    m = target.log_on_epoch_end(
        jnp.asarray(samples), jnp.asarray(data), prefix="val",
        out_dir=str(tmp_path), samples_not_resampled=jnp.asarray(data[:16]),
        make_plots=True,
    )
    assert np.isfinite(m["val/rama/resampled/torus_wasserstein"])
    assert np.isfinite(m["val/rama/not_resampled/torus_wasserstein"])
    assert np.isfinite(m["val/rama/resampled/w2"])
    # 5 of 48 samples mirrored
    assert abs(m["val/correct_symmetry_rate"] - 43 / 48) < 1e-6
    assert m["val/uncorrectable_symmetry_rate"] == 0.0
    assert np.isfinite(m["val/tica/w2"])
    import os

    assert os.path.exists(tmp_path / "ramachandran_resampled.png")
    assert os.path.exists(tmp_path / "tica.png")


@pytest.mark.slow
def test_md_backed_dataset_generation(tmp_path):
    """Peptide train sets come from Langevin MD by default (VERDICT #7:
    reference trains on MD data, not MALA-from-minimum)."""
    t = ALPEnergy("aldp", temperature=400.0, data_dir=str(tmp_path), data_source="md")
    data = t._load_or_generate("val", num_samples=128)
    assert data.shape == (128, t.dim)
    e = t.energy_kcal(jnp.asarray(data))
    assert bool(jnp.all(jnp.isfinite(e)))
    # cached on second call
    import os

    assert os.path.exists(tmp_path / "aldp_temp_400.00_val.npy")
    data2 = t._load_or_generate("val", num_samples=128)
    np.testing.assert_allclose(data, data2)
