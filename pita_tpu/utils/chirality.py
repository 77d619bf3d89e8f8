"""Chirality detection and correction for molecular samples.

Reference parity: ``pita/src/models/components/energy_utils.py:11-132`` —
bond-graph construction by distance cutoffs, chirality-center detection,
per-sample chirality sign via the signed volume of the substituent frame, and
mirroring of samples whose chirality flipped (non-equivariant models can emit
mirror images; alp_energy.py:244-271 corrects them).
"""

from typing import List, Sequence, Tuple

import numpy as np

# covalent distance cutoffs [nm] by element pair (energy_utils.py builds the
# bond graph from distances when no topology is given)
_CUTOFF = {("C", "C"): 0.18, ("C", "N"): 0.17, ("C", "O"): 0.16, ("C", "H"): 0.13,
           ("N", "H"): 0.12, ("O", "H"): 0.11, ("N", "N"): 0.16, ("N", "O"): 0.16}


def bonds_from_distances(x: np.ndarray, elements: Sequence[str]) -> List[Tuple[int, int]]:
    """Infer the bond graph from one structure by element-pair cutoffs."""
    n = len(elements)
    bonds = []
    for i in range(n):
        for j in range(i + 1, n):
            e = tuple(sorted((elements[i][0], elements[j][0])))
            cut = _CUTOFF.get(e, 0.0)
            if cut and np.linalg.norm(x[i] - x[j]) < cut:
                bonds.append((i, j))
    return bonds


def find_chirality_centers(bonds: Sequence[Tuple[int, int]], elements: Sequence[str]):
    """Carbons with 4 substituents whose branches are all distinct
    (energy_utils.py find_chirality_centers, via graph isomorphism; here a
    cheaper branch-fingerprint comparison with networkx)."""
    import networkx as nx

    g = nx.Graph(bonds)
    centers = []
    for c in g.nodes:
        if elements[c][0] != "C" or g.degree[c] != 4:
            continue
        fingerprints = []
        for nb in g.neighbors(c):
            h = nx.Graph(g)
            h.remove_node(c)
            # depth-annotated element fingerprint of the branch — distinguishes
            # branches with identical element multisets but different shape
            dists = nx.single_source_shortest_path_length(h, nb)
            fp = tuple(sorted((d, elements[a][0]) for a, d in dists.items()))
            fingerprints.append((fp, nb))
        fps = [f for f, _ in fingerprints]
        if len(set(fps)) == 4:
            nbrs = [nb for _, nb in sorted(fingerprints)]
            centers.append((c, tuple(nbrs)))
    return centers


def chirality_sign(x: np.ndarray, center: int, nbrs: Sequence[int]) -> np.ndarray:
    """Sign of the signed volume of the substituent frame; x: (..., N, 3)."""
    v1 = x[..., nbrs[0], :] - x[..., center, :]
    v2 = x[..., nbrs[1], :] - x[..., center, :]
    v3 = x[..., nbrs[2], :] - x[..., center, :]
    vol = np.sum(np.cross(v1, v2) * v3, axis=-1)
    return np.sign(vol)


def check_and_fix_chirality(
    x: np.ndarray, centers, reference_signs: Sequence[float]
) -> Tuple[np.ndarray, np.ndarray]:
    """Mirror samples whose chirality sign flipped at any center
    (energy_utils.py check_symmetry_change + the mirror fix).

    Returns (fixed samples, mask of samples that were mirrored).
    """
    x = np.asarray(x)
    flipped = np.zeros(x.shape[0], bool)
    for (c, nbrs), ref in zip(centers, reference_signs):
        s = chirality_sign(x, c, nbrs)
        flipped |= s != ref
    x_fixed = x.copy()
    x_fixed[flipped, :, 2] *= -1.0  # mirror through the xy plane
    return x_fixed, flipped
