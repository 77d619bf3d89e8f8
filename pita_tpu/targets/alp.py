"""Alanine-peptide targets via the self-contained JAX force field.

Reference parity: ``pita/src/energies/alp_energy.py`` — ACE-(ALA)n-NME
peptides with an amber-family force field and OBC implicit solvent. The
reference delegates energy/force to OpenMM on CUDA in 10k-sample chunks
(:101-149); here the amber-ff99SB-style parameter set is embedded directly
(types/charges/bonds/angles/torsions/LJ/GB below) and the energy is one jnp
program, so it fuses into the sampler scan and differentiates for free.

Parameter provenance: amber parm99/ff99SB values for the protein atom types
appearing in alanine peptides (CT, C, N, H, H1, HC, O), amber94/99 residue
charges (net-neutral per residue), mbondi2 GB radii with OBC screening. The
backbone φ/ψ torsion corrections follow ff99SB's published form; this set is
validated for internal consistency (force = -∇E, stable MD/MALA, reasonable
Ramachandran structure) rather than bit-parity with a particular amber
release.

Coordinates are in nanometers (OpenMM convention — the reference's datasets
are nm); the force field works in Å internally. Temperature is Kelvin;
``log_prob = -E / (kB·T)`` (alp_energy.py temperature handling).
"""

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pita_tpu.targets.base import Target
from pita_tpu.targets.forcefield import (
    BOLTZMANN_KCAL,
    ForceFieldParams,
    dihedral_angles,
    forcefield_energy,
)

NM_TO_ANGSTROM = 10.0

# ---- amber atom-type tables (parm99) ----
# LJ: (Rmin/2 [Å], eps [kcal/mol]);  sigma = 2·(Rmin/2)·2^(-1/6)
_LJ = {
    "CT": (1.9080, 0.1094),
    "C": (1.9080, 0.0860),
    "N": (1.8240, 0.1700),
    "O": (1.6612, 0.2100),
    "H": (0.6000, 0.0157),
    "H1": (1.3870, 0.0157),
    "HC": (1.4870, 0.0157),
}
_MASS = {"CT": 12.01, "C": 12.01, "N": 14.01, "O": 16.0, "H": 1.008, "H1": 1.008, "HC": 1.008}
# mbondi2 intrinsic GB radii [Å] + OBC screening (by element; H-on-N = 1.3)
_GB = {"C": (1.70, 0.72), "N": (1.55, 0.79), "O": (1.50, 0.85), "H": (1.20, 0.85)}

_BONDS = {  # (k [kcal/mol/Å²], r0 [Å])
    ("CT", "HC"): (340.0, 1.090),
    ("CT", "H1"): (340.0, 1.090),
    ("CT", "CT"): (310.0, 1.526),
    ("C", "CT"): (317.0, 1.522),
    ("C", "O"): (570.0, 1.229),
    ("C", "N"): (490.0, 1.335),
    ("N", "CT"): (337.0, 1.449),
    ("N", "H"): (434.0, 1.010),
}

_ANGLES = {  # (k [kcal/mol/rad²], theta0 [deg])
    ("HC", "CT", "HC"): (35.0, 109.5),
    ("H1", "CT", "H1"): (35.0, 109.5),
    ("CT", "CT", "HC"): (50.0, 109.5),
    ("CT", "CT", "H1"): (50.0, 109.5),
    ("C", "CT", "HC"): (50.0, 109.5),
    ("C", "CT", "H1"): (50.0, 109.5),
    ("C", "CT", "CT"): (63.0, 111.1),
    ("C", "CT", "N"): (63.0, 110.1),
    ("N", "CT", "CT"): (80.0, 109.7),
    ("N", "CT", "HC"): (50.0, 109.5),
    ("N", "CT", "H1"): (50.0, 109.5),
    ("CT", "C", "O"): (80.0, 120.4),
    ("CT", "C", "N"): (70.0, 116.6),
    ("O", "C", "N"): (80.0, 122.9),
    ("C", "N", "CT"): (50.0, 121.9),
    ("C", "N", "H"): (50.0, 120.0),
    ("CT", "N", "H"): (50.0, 118.04),
}

# torsions: type quad -> list of (periodicity, k [kcal/mol], phase [deg]).
# 'X' is a wildcard. Specific entries take precedence over wildcards.
_TORSIONS = {
    ("X", "C", "N", "X"): [(2, 2.5, 180.0)],
    ("X", "CT", "N", "X"): [],
    ("X", "CT", "C", "X"): [],
    ("X", "CT", "CT", "X"): [(3, 1.40 / 9.0, 0.0)],
    ("H", "N", "C", "O"): [(2, 2.5, 180.0), (1, 2.0, 0.0)],
    ("HC", "CT", "C", "O"): [(1, 0.80, 0.0), (3, 0.08, 180.0)],
    # ff99SB backbone corrections
    ("C", "N", "CT", "C"): [(2, 0.27, 0.0), (3, 0.42, 0.0)],  # φ (V1 = 0)
    ("N", "CT", "C", "N"): [(1, 0.45, 180.0), (2, 1.58, 180.0), (3, 0.55, 180.0)],  # ψ
    ("CT", "CT", "N", "C"): [(1, 2.00, 0.0), (2, 2.00, 0.0), (3, 0.40, 0.0)],  # φ'
    ("CT", "CT", "C", "N"): [(1, 0.20, 0.0), (2, 0.20, 0.0), (3, 0.40, 0.0)],  # ψ'
}
_IMPROPERS = {  # central atom third: (X, X, C, O) / (X, X, N, H)
    ("X", "X", "C", "O"): (2, 10.5, 180.0),
    ("X", "X", "N", "H"): (2, 1.0, 180.0),
}

# ---- residue templates: (atom_name, type, charge), bonds by name ----
_ACE = dict(
    atoms=[
        ("CH3", "CT", -0.3662), ("HH31", "HC", 0.1123), ("HH32", "HC", 0.1123),
        ("HH33", "HC", 0.1123), ("C", "C", 0.5972), ("O", "O", -0.5679),
    ],
    bonds=[("CH3", "HH31"), ("CH3", "HH32"), ("CH3", "HH33"), ("CH3", "C"), ("C", "O")],
    head=None,
    tail="C",
)
_ALA = dict(
    atoms=[
        ("N", "N", -0.4157), ("H", "H", 0.2719), ("CA", "CT", 0.0337),
        ("HA", "H1", 0.0823), ("CB", "CT", -0.1825), ("HB1", "HC", 0.0603),
        ("HB2", "HC", 0.0603), ("HB3", "HC", 0.0603), ("C", "C", 0.5973),
        ("O", "O", -0.5679),
    ],
    bonds=[
        ("N", "H"), ("N", "CA"), ("CA", "HA"), ("CA", "CB"), ("CB", "HB1"),
        ("CB", "HB2"), ("CB", "HB3"), ("CA", "C"), ("C", "O"),
    ],
    head="N",
    tail="C",
)
_NME = dict(
    atoms=[
        ("N", "N", -0.4157), ("H", "H", 0.2719), ("CH3", "CT", -0.1490),
        ("HH31", "H1", 0.0976), ("HH32", "H1", 0.0976), ("HH33", "H1", 0.0976),
    ],
    bonds=[("N", "H"), ("N", "CH3"), ("CH3", "HH31"), ("CH3", "HH32"), ("CH3", "HH33")],
    head="N",
    tail=None,
)


def build_peptide_topology(n_ala: int = 1):
    """Assemble ACE-(ALA)n-NME: atom lists, bond graph, φ/ψ index quads."""
    residues = [_ACE] + [_ALA] * n_ala + [_NME]
    names, types, charges, res_id = [], [], [], []
    bonds: List[Tuple[int, int]] = []
    offsets = []
    idx = 0
    for ri, res in enumerate(residues):
        offsets.append(idx)
        local = {}
        for name, typ, q in res["atoms"]:
            local[name] = idx
            names.append(name)
            types.append(typ)
            charges.append(q)
            res_id.append(ri)
            idx += 1
        for a, b in res["bonds"]:
            bonds.append((local[a], local[b]))
    # backbone links: tail(C) of residue i — head(N) of residue i+1
    for ri in range(len(residues) - 1):
        tail = residues[ri]["tail"]
        head = residues[ri + 1]["head"]
        t_idx = offsets[ri] + [a[0] for a in residues[ri]["atoms"]].index(tail)
        h_idx = offsets[ri + 1] + [a[0] for a in residues[ri + 1]["atoms"]].index(head)
        bonds.append((t_idx, h_idx))

    def find(ri, name):
        return offsets[ri] + [a[0] for a in residues[ri]["atoms"]].index(name)

    # φ = C(i-1)-N(i)-CA(i)-C(i); ψ = N(i)-CA(i)-C(i)-N(i+1) for each ALA
    phi_idx, psi_idx = [], []
    for ri in range(1, 1 + n_ala):
        phi_idx.append([find(ri - 1, "C"), find(ri, "N"),
                        find(ri, "CA"), find(ri, "C")])
        psi_idx.append([find(ri, "N"), find(ri, "CA"), find(ri, "C"),
                        find(ri + 1, "N")])
    return dict(
        names=names, types=types, charges=np.asarray(charges, np.float64),
        res_id=res_id, bonds=bonds,
        phi_idx=np.asarray(phi_idx), psi_idx=np.asarray(psi_idx),
    )


def _adjacency(n, bonds):
    adj = [[] for _ in range(n)]
    for a, b in bonds:
        adj[a].append(b)
        adj[b].append(a)
    return adj


def _lookup_torsion(tq):
    a, b, c, d = tq
    for key in [(a, b, c, d), (d, c, b, a)]:
        if key in _TORSIONS:
            return _TORSIONS[key]
    for key in [("X", b, c, "X"), ("X", c, b, "X")]:
        if key in _TORSIONS:
            return _TORSIONS[key]
    return []


def build_forcefield_params(topology) -> ForceFieldParams:
    types = topology["types"]
    bonds = topology["bonds"]
    n = len(types)
    adj = _adjacency(n, bonds)

    def btype(pair):
        a, b = pair
        key = (types[a], types[b])
        if key in _BONDS:
            return _BONDS[key]
        return _BONDS[(key[1], key[0])]

    bond_idx = np.asarray(bonds, np.int32)
    bond_k = np.asarray([btype(p)[0] for p in bonds])
    bond_r0 = np.asarray([btype(p)[1] for p in bonds])

    # angles: all bonded triples
    angle_list = []
    for j in range(n):
        nb = adj[j]
        for ii in range(len(nb)):
            for kk in range(ii + 1, len(nb)):
                angle_list.append((nb[ii], j, nb[kk]))

    def atype(tr):
        i, j, k = tr
        key = (types[i], types[j], types[k])
        if key in _ANGLES:
            return _ANGLES[key]
        return _ANGLES[(key[2], key[1], key[0])]

    angle_idx = np.asarray(angle_list, np.int32)
    angle_k = np.asarray([atype(t)[0] for t in angle_list])
    angle_t0 = np.deg2rad([atype(t)[1] for t in angle_list])

    # proper torsions: all bonded quads i-j-k-l with i≠l
    tor_idx, tor_k, tor_n, tor_ph = [], [], [], []
    for j, k in bonds:
        for i in adj[j]:
            if i == k:
                continue
            for l in adj[k]:
                if l == j or l == i:
                    continue
                terms = _lookup_torsion((types[i], types[j], types[k], types[l]))
                for (per, kk, ph) in terms:
                    if kk == 0:
                        continue
                    tor_idx.append((i, j, k, l))
                    tor_k.append(kk)
                    tor_n.append(per)
                    tor_ph.append(np.deg2rad(ph))
    # impropers: carbonyl C (bonded to O) and amide N (bonded to H)
    for c in range(n):
        if types[c] == "C":
            o = [a for a in adj[c] if types[a] == "O"]
            others = [a for a in adj[c] if types[a] != "O"]
            if o and len(others) == 2:
                per, kk, ph = _IMPROPERS[("X", "X", "C", "O")]
                tor_idx.append((others[0], others[1], c, o[0]))
                tor_k.append(kk)
                tor_n.append(per)
                tor_ph.append(np.deg2rad(ph))
        if types[c] == "N":
            h = [a for a in adj[c] if types[a] == "H"]
            others = [a for a in adj[c] if types[a] != "H"]
            if h and len(others) == 2:
                per, kk, ph = _IMPROPERS[("X", "X", "N", "H")]
                tor_idx.append((others[0], others[1], c, h[0]))
                tor_k.append(kk)
                tor_n.append(per)
                tor_ph.append(np.deg2rad(ph))

    # exclusions: 1-2 and 1-3 excluded; 1-4 scaled (amber: LJ 1/2, coul 1/1.2)
    from collections import deque

    dist = np.full((n, n), 99, np.int32)
    for src in range(n):
        dist[src, src] = 0
        q = deque([src])
        while q:
            a = q.popleft()
            if dist[src, a] >= 4:
                continue
            for b in adj[a]:
                if dist[src, b] > dist[src, a] + 1:
                    dist[src, b] = dist[src, a] + 1
                    q.append(b)
    nb_scale = np.ones((n, n))
    coul_scale = np.ones((n, n))
    nb_scale[dist <= 2] = 0.0
    coul_scale[dist <= 2] = 0.0
    nb_scale[dist == 3] = 1.0 / 2.0
    coul_scale[dist == 3] = 1.0 / 1.2

    sigma = np.asarray([2 * _LJ[t][0] * 2 ** (-1 / 6) for t in types])
    eps = np.asarray([_LJ[t][1] for t in types])

    gb_radii, gb_screen = [], []
    for i, t in enumerate(types):
        el = t[0] if t[0] != "H" else "H"
        r, s = _GB[el]
        if el == "H" and any(types[a] == "N" for a in adj[i]):
            r = 1.3  # mbondi2: H on N
        gb_radii.append(r)
        gb_screen.append(s)

    return ForceFieldParams(
        bond_idx=bond_idx,
        bond_k=np.asarray(bond_k),
        bond_r0=np.asarray(bond_r0),
        angle_idx=angle_idx,
        angle_k=np.asarray(angle_k),
        angle_t0=np.asarray(angle_t0),
        torsion_idx=np.asarray(tor_idx, np.int32),
        torsion_k=np.asarray(tor_k),
        torsion_n=np.asarray(tor_n, np.float64),
        torsion_phase=np.asarray(tor_ph),
        charges=topology["charges"],
        lj_sigma=sigma,
        lj_eps=eps,
        nb_scale=nb_scale,
        coul_scale=coul_scale,
        gb_radii=np.asarray(gb_radii),
        gb_screen=np.asarray(gb_screen),
    )


PEPTIDES = {"aldp": 1, "al3": 2, "al4": 3, "al5": 4, "al6": 5}


class ALPEnergy(Target):
    """ACE-(ALA)n-NME Boltzmann target at temperature T [Kelvin]."""

    is_molecule = True
    n_spatial_dim = 3

    def __init__(
        self,
        peptide: str = "aldp",
        temperature: float = 300.0,
        implicit_solvent: bool = True,
        data_dir: Optional[str] = None,
        data_source: str = "md",
        data_url: Optional[str] = None,
        data_sha256: Optional[str] = None,
    ):
        self.peptide = peptide
        n_ala = PEPTIDES[peptide]
        self.topology = build_peptide_topology(n_ala)

        def _to_jnp(a):
            a = np.asarray(a)
            if np.issubdtype(a.dtype, np.floating):
                return jnp.asarray(a, jnp.float32)
            return jnp.asarray(a)

        raw = build_forcefield_params(self.topology)
        self.params = ForceFieldParams(*[_to_jnp(a) for a in raw])
        self.n_particles = len(self.topology["types"])
        self.dim = self.n_particles * 3
        self.temperature = float(temperature)
        self.implicit_solvent = implicit_solvent
        self.name = peptide
        self.data_dir = data_dir
        self.data_source = data_source
        self.data_url = data_url
        self.data_sha256 = data_sha256
        self._initial_structure = None

    # ---- energy ----

    def energy_kcal(self, x: jnp.ndarray) -> jnp.ndarray:
        """Potential energy [kcal/mol]; x: (..., dim) in nm."""
        xr = x.reshape(*x.shape[:-1], self.n_particles, 3) * NM_TO_ANGSTROM
        return forcefield_energy(self.params, xr, implicit_solvent=self.implicit_solvent)

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        return -self.energy_kcal(x) / (BOLTZMANN_KCAL * self.temperature)

    # ---- geometry / features ----

    def dihedrals(self, x: jnp.ndarray):
        """(φ, ψ) [rad] per ALA residue; x: (..., dim) nm (alp_energy.py:278-291)."""
        xr = x.reshape(*x.shape[:-1], self.n_particles, 3)
        phi = dihedral_angles(xr, self.topology["phi_idx"])
        psi = dihedral_angles(xr, self.topology["psi_idx"])
        return phi, psi

    def initial_structure(self) -> np.ndarray:
        """A relaxed structure [nm]: shipped asset, else embed + minimize."""
        if self._initial_structure is None:
            import os

            asset = os.path.join(
                os.path.dirname(__file__), "..", "assets", f"{self.peptide}_minimized.npy"
            )
            if os.path.exists(asset):
                self._initial_structure = np.load(asset)
            else:
                x0 = _rough_embed(self.topology)
                self._initial_structure = _minimize(self, x0)
        return self._initial_structure

    def _load_or_generate(self, which, num_samples=5000):
        """Train/val/test sets, in preference order:

        1. cached ``{peptide}_temp_{T}_{which}.npy`` under ``data_dir``
           (reference path convention, base_molecule_energy_function.py:54-68),
        2. download by URL when ``data_url`` is configured (the reference
           datamodule's prepare_data, base_datamodule.py:63-83),
        3. generate: Langevin MD (``data_source="md"``, default — the
           reference trains on MD data; baselines/md.py BAOAB) or adaptive
           MALA (``data_source="mala"``).
        """
        import os

        if self.data_dir is not None:
            path = os.path.join(
                self.data_dir, f"{self.peptide}_temp_{self.temperature:.2f}_{which}.npy"
            )
            if os.path.exists(path):
                return np.load(path).reshape(-1, self.dim)
            if self.data_url is not None:
                from pita_tpu.io.datamodule import download_dataset

                download_dataset(
                    self.data_url.format(peptide=self.peptide, which=which),
                    path, sha256=self.data_sha256,
                )
                return np.load(path).reshape(-1, self.dim)
        else:
            path = None

        seeds = dict(train=11, val=12, test=13)
        if self.data_source == "md":
            data = self._generate_md_set(which, num_samples, seeds[which])
        else:
            data = self._generate_mala_set(which, num_samples, seeds[which])
        if path is not None:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            np.save(path, data)
        return data

    def _generate_md_set(self, which, num_samples, seed):
        """Langevin-MD dataset: replicas from the relaxed structure, BAOAB at
        the target temperature, warmup discarded, frames pooled."""
        import tempfile

        from pita_tpu.baselines.md import generate_md_dataset

        n_replicas = 32
        # report_interval=100 → frames = steps/100; generate 2× for warmup
        n_steps = max(int(np.ceil(2 * num_samples / n_replicas)) * 100, 2000)
        with tempfile.NamedTemporaryFile(suffix=".npz") as tmp:
            generate_md_dataset(
                self, tmp.name, n_steps=n_steps, n_replicas=n_replicas, seed=seed
            )
            z = np.load(tmp.name)
            frames = z["positions"]  # (T, R, dim)
        n_frames = frames.shape[0]
        frames = frames[n_frames // 2:]  # discard warmup half
        data = frames.reshape(-1, self.dim)
        rng = np.random.default_rng(seed)
        idx = rng.permutation(len(data))[:num_samples]
        return data[idx]

    def _generate_mala_set(self, which, num_samples, seed):
        from pita_tpu.baselines.mcmc import mala_chain

        key = jax.random.PRNGKey(seed)
        n_chains = 128
        x0 = jnp.asarray(
            np.tile(self.initial_structure().reshape(1, -1), (n_chains, 1))
        )
        x0 = x0 + jax.random.normal(key, x0.shape) * 1e-3
        x, _, dt = mala_chain(self.log_prob_and_force, x0, key, 3000, dt=1e-7)
        out = []
        rounds = int(np.ceil(num_samples / n_chains))
        for r in range(rounds):
            x, _, dt = mala_chain(
                self.log_prob_and_force, x, jax.random.fold_in(key, r), 200, dt=float(dt)
            )
            out.append(np.asarray(x))
        return np.concatenate(out)[:num_samples]

    def setup_train_set(self):
        return self._load_or_generate("train")

    def setup_val_set(self):
        return self._load_or_generate("val", num_samples=2000)

    def setup_test_set(self):
        return self._load_or_generate("test", num_samples=2000)

    def log_on_epoch_end(
        self,
        samples,
        data,
        *,
        prefix: str = "val",
        out_dir=None,
        samples_not_resampled=None,
        make_plots: bool = False,
        num_eval_samples: int = 5000,
    ) -> dict:
        """Peptide evaluation: Ramachandran metrics + torus-Wasserstein on φ/ψ,
        chirality check/correction rates, TICA-space distances, figures.

        Reference: ``ALPEnergy.log_on_epoch_end`` (alp_energy.py:190-291),
        ``get_ramachandran_metrics`` (:278-291, torus-W at :290), chirality
        check/fix (:244-271), TICA plots (:433-471). One deliberate fix: the
        reference's not_resampled Ramachandran metrics are computed on the
        *resampled* samples (a bug at alp_energy.py:234-236); we use the actual
        not-resampled set.
        """
        import os

        import numpy as np

        from pita_tpu.metrics.distances import (
            compute_distribution_distances,
            torus_wasserstein,
        )
        from pita_tpu.utils.chirality import check_and_fix_chirality, find_chirality_centers

        samples = np.asarray(samples)[:num_eval_samples]
        data = np.asarray(data)[:num_eval_samples]
        metrics = {}

        def phi_psi(x):
            phi, psi = self.dihedrals(jnp.asarray(x))
            return np.concatenate([np.asarray(phi), np.asarray(psi)], axis=-1)

        x_true = phi_psi(data)

        def rama_metrics(x_gen, tag):
            n = min(len(x_gen), len(x_true))
            m = compute_distribution_distances(
                phi_psi(x_gen)[:n], x_true[:n], prefix=f"{prefix}/rama/{tag}"
            )
            m[f"{prefix}/rama/{tag}/torus_wasserstein"] = torus_wasserstein(
                phi_psi(x_gen)[:n], x_true[:n]
            )
            return m

        metrics.update(rama_metrics(samples, "resampled"))
        if samples_not_resampled is not None:
            metrics.update(
                rama_metrics(np.asarray(samples_not_resampled), "not_resampled")
            )

        # chirality: reference signs from one data structure; mirror-correct the
        # generated set, report correct/uncorrectable rates (alp_energy.py:244-271)
        elements = [n[0] for n in self.topology["names"]]
        centers = find_chirality_centers(self.topology["bonds"], elements)
        if centers:
            xr_data = data.reshape(-1, self.n_particles, 3)
            from pita_tpu.utils.chirality import chirality_sign

            ref_signs = [chirality_sign(xr_data[[1]], c, nbrs)[0] for c, nbrs in centers]
            xr = samples.reshape(-1, self.n_particles, 3)
            fixed, flipped = check_and_fix_chirality(xr, centers, ref_signs)
            metrics[f"{prefix}/correct_symmetry_rate"] = float(1.0 - flipped.mean())
            _, still = check_and_fix_chirality(fixed, centers, ref_signs)
            metrics[f"{prefix}/uncorrectable_symmetry_rate"] = float(still.mean())
            samples_fixed = fixed[~still].reshape(-1, self.dim)
        else:
            samples_fixed = samples

        # TICA: fit on the (time-ordered) data features, project both sets,
        # distances in IC space (tica.py capability; base_datamodule TICA metric)
        try:
            from pita_tpu.metrics.tica import run_tica

            tica = run_tica(self, data, generated=samples_fixed)
            n = min(len(tica["generated_proj"]), len(tica["data_proj"]))
            metrics.update(
                compute_distribution_distances(
                    tica["generated_proj"][:n], tica["data_proj"][:n],
                    prefix=f"{prefix}/tica",
                )
            )
        except (AssertionError, ValueError) as e:
            print(f"TICA skipped: {e}")
            tica = None

        # internal-coordinate marginal KLDs (fab/fab/utils/aldp.py
        # evaluate_aldp parity)
        from pita_tpu.metrics.internal_coords import evaluate_internal_coords

        metrics.update(
            evaluate_internal_coords(self, samples_fixed, data, prefix=f"{prefix}/ic")
        )

        if make_plots and out_dir is not None:
            from pita_tpu.io import plotting as P

            phi_g, psi_g = self.dihedrals(jnp.asarray(samples_fixed))
            P.plot_ramachandran(
                np.asarray(phi_g), np.asarray(psi_g), out_dir,
                name="ramachandran_resampled", temperature=self.temperature,
            )
            phi_d, psi_d = self.dihedrals(jnp.asarray(data))
            P.plot_ramachandran(
                np.asarray(phi_d), np.asarray(psi_d), out_dir,
                name="ramachandran_ground_truth", temperature=self.temperature,
            )
            if samples_not_resampled is not None:
                phi_n, psi_n = self.dihedrals(jnp.asarray(samples_not_resampled))
                P.plot_ramachandran(
                    np.asarray(phi_n), np.asarray(psi_n), out_dir,
                    name="ramachandran_not_resampled", temperature=self.temperature,
                )
            if tica is not None:
                P.plot_tica_density(
                    tica["data_proj"], out_dir, name="tica",
                    proj_generated=tica.get("generated_proj"),
                )
        return metrics


# per-residue template offsets [nm] for an extended-chain embed; the chain
# advances 0.35 nm per residue along +x. Crude — followed by minimization.
_EMBED_TEMPLATES = {
    "ACE": {
        "CH3": (0.10, 0.02, 0.00), "HH31": (0.04, -0.04, -0.06),
        "HH32": (0.05, 0.08, 0.08), "HH33": (0.16, -0.05, 0.06),
        "C": (0.21, 0.12, 0.05), "O": (0.15, 0.22, 0.08),
    },
    "ALA": {
        "N": (0.00, 0.00, 0.00), "H": (-0.05, 0.09, 0.00),
        "CA": (0.145, 0.00, 0.00), "HA": (0.175, 0.06, 0.085),
        "CB": (0.19, -0.10, -0.10), "HB1": (0.29, -0.08, -0.12),
        "HB2": (0.15, -0.08, -0.19), "HB3": (0.18, -0.21, -0.08),
        "C": (0.21, 0.12, 0.05), "O": (0.15, 0.22, 0.08),
    },
    "NME": {
        "N": (0.00, 0.00, 0.00), "H": (-0.05, 0.09, 0.00),
        "CH3": (0.145, 0.00, 0.00), "HH31": (0.25, 0.02, 0.00),
        "HH32": (0.12, 0.06, 0.09), "HH33": (0.12, -0.10, 0.03),
    },
}


def _rough_embed(topology) -> np.ndarray:
    """Extended-chain placement from per-residue templates, in nm."""
    names = topology["names"]
    res_id = topology["res_id"]
    n_res = max(res_id) + 1
    pos = np.zeros((len(names), 3))
    rng = np.random.default_rng(0)
    for i, (name, ri) in enumerate(zip(names, res_id)):
        kind = "ACE" if ri == 0 else ("NME" if ri == n_res - 1 else "ALA")
        off = np.asarray(_EMBED_TEMPLATES[kind][name])
        pos[i] = off + np.asarray([0.35 * ri, 0.0, 0.0]) + rng.normal(0, 0.002, 3)
    return pos.reshape(-1)


def _minimize(target: ALPEnergy, x0: np.ndarray, steps: int = 4000) -> np.ndarray:
    """Adam energy minimization as one jitted scan (pure JAX)."""
    import optax

    opt = optax.adam(2e-3)

    def e_fn(x):
        return target.energy_kcal(x[None])[0]

    @jax.jit
    def run(x):
        state = opt.init(x)

        def body(carry, _):
            x, state = carry
            e, g = jax.value_and_grad(e_fn)(x)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            updates, state = opt.update(g, state, x)
            x = optax.apply_updates(x, updates)
            return (x, state), e

        (x, _), es = jax.lax.scan(body, (x, state), None, length=steps)
        return x, es

    x, es = run(jnp.asarray(x0, jnp.float32))
    return np.asarray(x)
