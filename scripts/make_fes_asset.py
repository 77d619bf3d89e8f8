"""Generate the committed φ/ψ free-energy-surface asset for alanine dipeptide.

Runs long BAOAB Langevin MD at 300 K on the self-contained force field
(baselines/md.py — the reference uses OpenMM + amber99 + OBC GB-implicit
solvent, generate_md.py:38-111) and commits the dihedral trace (NOT the full
positions — φ/ψ is what the FES test needs and it keeps the asset small) to
``pita_tpu/assets/aldp_fes_T300_phipsi.npz``.

``tests/test_alp_fes.py`` checks the basin populations and barrier heights
of this committed trajectory against published alanine-dipeptide values —
the conformer-level external anchor for the force field (VERDICT r2
missing #6).

Run on the TPU chip (minutes); CPU works but takes ~an hour:
    python scripts/make_fes_asset.py [n_steps_per_chunk n_chunks]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(
    os.path.dirname(__file__), "..", "pita_tpu", "assets",
    "aldp_fes_T300_phipsi.npz",
)


def main(n_steps_per_chunk=20000, n_chunks=25, n_replicas=64):
    from pita_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    import jax
    import jax.numpy as jnp

    from pita_tpu.baselines.md import MDConfig, langevin_md
    from pita_tpu.targets.alp import ALPEnergy

    target = ALPEnergy("aldp", temperature=300.0)
    cfg = MDConfig(
        temperature=300.0, n_steps=n_steps_per_chunk, report_interval=200
    )
    key = jax.random.PRNGKey(7)
    x = jnp.tile(jnp.asarray(target.initial_structure())[None], (n_replicas, 1))
    x = x + jax.random.normal(key, x.shape) * 1e-3

    run = jax.jit(lambda k, x: langevin_md(k, target, x, cfg))
    phis, psis, energies = [], [], []
    for c in range(n_chunks):
        res = run(jax.random.fold_in(key, c), x)
        x = res.positions[-1]
        if c == 0:
            continue  # discard the first chunk as equilibration
        frames = res.positions.reshape(-1, x.shape[-1])
        phi, psi = target.dihedrals(frames)
        phis.append(np.asarray(phi).reshape(-1))
        psis.append(np.asarray(psi).reshape(-1))
        energies.append(np.asarray(res.potential_energies).reshape(-1))
        print(
            f"chunk {c}/{n_chunks - 1}: <E>={np.mean(energies[-1]):.2f} "
            f"kcal/mol, frames so far {sum(len(p) for p in phis)}",
            file=sys.stderr,
        )

    phi = np.concatenate(phis).astype(np.float32)
    psi = np.concatenate(psis).astype(np.float32)
    e = np.concatenate(energies).astype(np.float32)
    total_ps = (n_chunks - 1) * n_steps_per_chunk * cfg.dt * n_replicas
    np.savez(
        OUT,
        phi=phi,
        psi=psi,
        energies=e,
        temperature=300.0,
        n_replicas=n_replicas,
        total_sim_ps=total_ps,
        dt_ps=cfg.dt,
        report_interval=cfg.report_interval,
    )
    print(f"wrote {OUT}: {len(phi)} frames, {total_ps:.0f} ps aggregate")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
