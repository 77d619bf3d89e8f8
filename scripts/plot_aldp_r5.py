"""Offline ALDP test-phase evaluation against the committed 300 K MD anchor.

Loads a test-phase sample dump (``samples_temperature_*_annealed_to_*.npz``,
written by ``Trainer.test`` — reference parity: ``energytemp_module.py``'s
test-time dumps), computes phi/psi via the force-field topology, and writes

  - ``docs/aldp_r5_ramachandran.png`` — model vs MD-anchor densities
  - ``docs/aldp_r5_eval.json``      — torus-W, basin occupancies, provenance

Runs on CPU (no chip needed): the heavy work is just dihedral geometry.

Usage:
    python scripts/plot_aldp_r5.py runs_r5/aldp_q50/samples_temperature_555.520_annealed_to_300.000.npz
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def basin_occupancy(phi, psi):
    """Coarse Ramachandran basins (same convention as the round-1 MD note):
    alpha-R (phi<0, -120<psi<30), beta/PPII (phi<0, psi>=30 or psi<=-120),
    alpha-L (phi>0)."""
    phi = np.degrees(np.asarray(phi)).ravel()
    psi = np.degrees(np.asarray(psi)).ravel()
    alpha_l = phi > 0
    alpha_r = (~alpha_l) & (psi > -120) & (psi < 30)
    beta = (~alpha_l) & ~alpha_r
    n = max(len(phi), 1)
    return {
        "alpha_R": float(alpha_r.sum()) / n,
        "beta_PPII": float(beta.sum()) / n,
        "alpha_L": float(alpha_l.sum()) / n,
    }


def main(sample_path):
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pita_tpu.metrics.distances import torus_wasserstein
    from pita_tpu.targets.alp import ALPEnergy

    here = os.path.join(os.path.dirname(__file__), "..")
    anchor = np.load(os.path.join(here, "pita_tpu", "assets", "aldp_fes_T300_phipsi.npz"))
    target = ALPEnergy(peptide="aldp")

    samples = np.load(sample_path)["samples"]
    phi, psi = target.dihedrals(jnp.asarray(samples))
    phi = np.asarray(phi).ravel()
    psi = np.asarray(psi).ravel()

    # torus-W on matched subsamples (the anchor has 153k points)
    rng = np.random.default_rng(0)
    n = min(len(phi), 2048)  # matches trainer num_eval_samples; Hungarian is O(n^3)
    idx_m = rng.choice(len(phi), n, replace=False)
    idx_a = rng.choice(len(anchor["phi"]), n, replace=False)
    ang_m = np.stack([phi[idx_m], psi[idx_m]], axis=-1)
    ang_a = np.stack([anchor["phi"][idx_a], anchor["psi"][idx_a]], axis=-1)
    tw = float(torus_wasserstein(ang_m, ang_a))

    occ_m = basin_occupancy(phi, psi)
    occ_a = basin_occupancy(anchor["phi"], anchor["psi"])

    fig, axes = plt.subplots(1, 2, figsize=(9, 4), sharex=True, sharey=True)
    for ax, (p, s), title in [
        (axes[0], (phi, psi), f"model ({os.path.basename(sample_path)})"),
        (axes[1], (anchor["phi"], anchor["psi"]), "MD anchor (300 K)"),
    ]:
        ax.hist2d(np.degrees(p), np.degrees(s), bins=90,
                  range=[[-180, 180], [-180, 180]], cmap="viridis", cmin=1)
        ax.set_title(title, fontsize=9)
        ax.set_xlabel("phi (deg)")
    axes[0].set_ylabel("psi (deg)")
    fig.suptitle(f"ALDP Ramachandran — torus-W = {tw:.3f}", fontsize=10)
    fig.tight_layout()
    out_png = os.path.join(here, "docs", "aldp_r5_ramachandran.png")
    fig.savefig(out_png, dpi=130)

    out = {
        "sample_path": os.path.relpath(sample_path, here),
        "n_samples": int(len(samples)),
        "torus_wasserstein_vs_anchor": tw,
        "basin_occupancy_model": occ_m,
        "basin_occupancy_anchor": occ_a,
    }
    out_json = os.path.join(here, "docs", "aldp_r5_eval.json")
    with open(out_json, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print("wrote", out_png, "and", out_json)


if __name__ == "__main__":
    main(sys.argv[1])
