"""ALP force-field parameter audit against published AMBER values.

The environment has no OpenMM, so external validation is against *stored
published reference values* (VERDICT round-1 item 3): every bond, angle, LJ,
charge, GB and ff99SB-backbone-torsion parameter used for alanine peptides is
asserted against the AMBER literature values below.

Sources:
- parm99.dat (Wang, Cieplak & Kollman, J. Comput. Chem. 21, 1049 (2000)):
  bond/angle/LJ/general-torsion parameters for types CT, C, N, H, H1, HC, O.
- Cornell et al., JACS 117, 5179 (1995) ff94 residue charge set (unchanged in
  ff99/ff99SB) for ALA, ACE, NME.
- Hornak et al., Proteins 65, 712 (2006) — frcmod.ff99SB backbone torsion
  corrections (PK = Vn/2 convention, as in the frcmod file).
- mbondi2 GB radii (Onufriev, Bashford & Case, Proteins 55, 383 (2004)):
  H 1.2 Å (1.3 on N), C 1.7, N 1.55, O 1.5; OBC scaling factors
  H 0.85, C 0.72, N 0.79, O 0.85.
"""

import numpy as np

from pita_tpu.targets import alp


# ---- parm99.dat, BOND section (k [kcal/mol/Å²], r0 [Å]) ----
PARM99_BONDS = {
    ("CT", "HC"): (340.0, 1.090),
    ("CT", "H1"): (340.0, 1.090),
    ("CT", "CT"): (310.0, 1.526),
    ("C", "CT"): (317.0, 1.522),
    ("C", "O"): (570.0, 1.229),
    ("C", "N"): (490.0, 1.335),
    ("N", "CT"): (337.0, 1.449),
    ("N", "H"): (434.0, 1.010),
}

# ---- parm99.dat, ANGLE section (k [kcal/mol/rad²], θ0 [deg]) ----
PARM99_ANGLES = {
    ("HC", "CT", "HC"): (35.0, 109.5),
    ("H1", "CT", "H1"): (35.0, 109.5),
    ("CT", "CT", "HC"): (50.0, 109.5),
    ("CT", "CT", "H1"): (50.0, 109.5),
    ("C", "CT", "HC"): (50.0, 109.5),
    ("C", "CT", "H1"): (50.0, 109.5),
    ("C", "CT", "CT"): (63.0, 111.1),
    ("C", "CT", "N"): (63.0, 110.1),
    ("N", "CT", "CT"): (80.0, 109.7),
    ("N", "CT", "H1"): (50.0, 109.5),  # parm99 H1-CT-N (backbone HA)
    ("CT", "C", "O"): (80.0, 120.4),
    ("CT", "C", "N"): (70.0, 116.6),
    ("O", "C", "N"): (80.0, 122.9),
    ("C", "N", "CT"): (50.0, 121.9),
    ("C", "N", "H"): (50.0, 120.0),
    ("CT", "N", "H"): (50.0, 118.04),
    # not a parm99 entry (proteins have no HC on an N-adjacent carbon);
    # present in the table as an H1-equivalent fallback, inert for alanine
    # peptides (every N-adjacent carbon's hydrogens are type H1)
    ("N", "CT", "HC"): (50.0, 109.5),
}

# ---- parm99.dat, MOD4 vdW section (Rmin/2 [Å], ε [kcal/mol]) ----
PARM99_LJ = {
    "CT": (1.9080, 0.1094),
    "C": (1.9080, 0.0860),
    "N": (1.8240, 0.1700),
    "O": (1.6612, 0.2100),
    "H": (0.6000, 0.0157),
    "H1": (1.3870, 0.0157),
    "HC": (1.4870, 0.0157),
}

# ---- Cornell ff94 charges (e) ----
FF94_CHARGES = {
    "ALA": {
        "N": -0.4157, "H": 0.2719, "CA": 0.0337, "HA": 0.0823,
        "CB": -0.1825, "HB1": 0.0603, "HB2": 0.0603, "HB3": 0.0603,
        "C": 0.5973, "O": -0.5679,
    },
    "ACE": {
        "CH3": -0.3662, "HH31": 0.1123, "HH32": 0.1123, "HH33": 0.1123,
        "C": 0.5972, "O": -0.5679,
    },
    "NME": {
        "N": -0.4157, "H": 0.2719, "CH3": -0.1490,
        "HH31": 0.0976, "HH32": 0.0976, "HH33": 0.0976,
    },
}

# ---- frcmod.ff99SB backbone torsions (PK, phase [deg]) by periodicity ----
FF99SB_TORSIONS = {
    ("C", "N", "CT", "C"): {2: (0.27, 0.0), 3: (0.42, 0.0)},  # φ (V1 = V4 = 0)
    ("N", "CT", "C", "N"): {1: (0.45, 180.0), 2: (1.58, 180.0), 3: (0.55, 180.0)},  # ψ
    ("CT", "CT", "N", "C"): {1: (2.00, 0.0), 2: (2.00, 0.0), 3: (0.40, 0.0)},  # φ'
    ("CT", "CT", "C", "N"): {1: (0.20, 0.0), 2: (0.20, 0.0), 3: (0.40, 0.0)},  # ψ'
}

# ---- parm99.dat general/specific torsions used by alanine peptides ----
PARM99_TORSIONS = {
    # X-C-N-X: PK_total 10.0 over IDIVF=4 paths → 2.5 per path, n=2, 180°
    ("X", "C", "N", "X"): {2: (10.0 / 4.0, 180.0)},
    ("X", "CT", "N", "X"): {},  # 0.0
    ("X", "CT", "C", "X"): {},  # 0.0
    ("X", "CT", "CT", "X"): {3: (1.40 / 9.0, 0.0)},
    ("H", "N", "C", "O"): {2: (2.5, 180.0), 1: (2.0, 0.0)},
    ("HC", "CT", "C", "O"): {1: (0.80, 0.0), 3: (0.08, 180.0)},
}

PARM99_IMPROPERS = {
    ("X", "X", "C", "O"): (2, 10.5, 180.0),
    ("X", "X", "N", "H"): (2, 1.0, 180.0),
}

MBONDI2_RADII = {"C": 1.70, "N": 1.55, "O": 1.50, "H": 1.20}
OBC_SCREEN = {"C": 0.72, "N": 0.79, "O": 0.85, "H": 0.85}


def _sorted_pair(p):
    return tuple(sorted(p))


def test_bond_parameters_match_parm99():
    for pair, ref in PARM99_BONDS.items():
        got = alp._BONDS.get(pair) or alp._BONDS.get(pair[::-1])
        assert got is not None, f"missing bond {pair}"
        np.testing.assert_allclose(got, ref, err_msg=str(pair))
    # no extra entries beyond the audited set
    for pair in alp._BONDS:
        assert pair in PARM99_BONDS or pair[::-1] in PARM99_BONDS


def test_angle_parameters_match_parm99():
    for tri, ref in PARM99_ANGLES.items():
        got = alp._ANGLES.get(tri) or alp._ANGLES.get(tri[::-1])
        assert got is not None, f"missing angle {tri}"
        np.testing.assert_allclose(got, ref, err_msg=str(tri))
    for tri in alp._ANGLES:
        assert tri in PARM99_ANGLES or tri[::-1] in PARM99_ANGLES


def test_lj_parameters_match_parm99():
    assert set(alp._LJ) == set(PARM99_LJ)
    for t, ref in PARM99_LJ.items():
        np.testing.assert_allclose(alp._LJ[t], ref, err_msg=t)


def test_charges_match_ff94():
    for res, tmpl in [("ACE", alp._ACE), ("ALA", alp._ALA), ("NME", alp._NME)]:
        for name, _, q in tmpl["atoms"]:
            np.testing.assert_allclose(
                q, FF94_CHARGES[res][name], err_msg=f"{res}/{name}"
            )
        # residues are net-neutral in ff94 (to 1e-4 e rounding)
        assert abs(sum(q for _, _, q in tmpl["atoms"])) < 2e-4


def test_backbone_torsions_match_ff99sb():
    for quad, ref in {**FF99SB_TORSIONS, **PARM99_TORSIONS}.items():
        got = alp._TORSIONS.get(quad) or alp._TORSIONS.get(quad[::-1])
        assert got is not None or ref == {}, f"missing torsion {quad}"
        got_by_n = {int(n): (k, ph) for n, k, ph in (got or [])}
        assert set(got_by_n) == set(ref), f"{quad}: terms {set(got_by_n)} != {set(ref)}"
        for n, (k, ph) in ref.items():
            np.testing.assert_allclose(got_by_n[n][0], k, rtol=1e-6, err_msg=f"{quad} V{n}")
            np.testing.assert_allclose(got_by_n[n][1], ph, err_msg=f"{quad} phase{n}")


def test_impropers_match_parm99():
    for quad, ref in PARM99_IMPROPERS.items():
        np.testing.assert_allclose(alp._IMPROPERS[quad], ref, err_msg=str(quad))


def test_gb_radii_match_mbondi2():
    for el, r in MBONDI2_RADII.items():
        np.testing.assert_allclose(alp._GB[el][0], r, err_msg=el)
        np.testing.assert_allclose(alp._GB[el][1], OBC_SCREEN[el], err_msg=el)
    # H bonded to N gets the mbondi2 1.3 Å override
    target = alp.ALPEnergy("aldp")
    names = target.topology["names"]
    types = target.topology["types"]
    adj = alp._adjacency(len(names), target.topology["bonds"])
    radii = np.asarray(target.params.gb_radii)
    for i, t in enumerate(types):
        if t == "H" and any(types[a] == "N" for a in adj[i]):
            np.testing.assert_allclose(radii[i], 1.3, err_msg=names[i])
        elif t.startswith("H"):
            np.testing.assert_allclose(radii[i], 1.2, err_msg=names[i])


def test_14_scaling_is_amber():
    target = alp.ALPEnergy("aldp")
    nb = np.asarray(target.params.nb_scale)
    cl = np.asarray(target.params.coul_scale)
    # pick a known 1-4 pair: ACE CH3 (atom 0) and ALA N..? use graph distances
    adj = alp._adjacency(target.n_particles, target.topology["bonds"])
    from collections import deque

    dist = np.full(target.n_particles, 99)
    dist[0] = 0
    q = deque([0])
    while q:
        a = q.popleft()
        for b in adj[a]:
            if dist[b] > dist[a] + 1:
                dist[b] = dist[a] + 1
                q.append(b)
    for j in range(target.n_particles):
        if dist[j] == 3:
            np.testing.assert_allclose(nb[0, j], 0.5)
            np.testing.assert_allclose(cl[0, j], 1.0 / 1.2)
        elif 1 <= dist[j] <= 2:
            assert nb[0, j] == 0.0 and cl[0, j] == 0.0
