"""Alanine-dipeptide φ/ψ free-energy surface vs published values.

The committed asset ``pita_tpu/assets/aldp_fes_T300_phipsi.npz``
(scripts/make_fes_asset.py — long BAOAB MD at 300 K on the self-contained
ff99SB-style force field with OBC GB implicit solvent) is checked against
the literature picture of the dipeptide surface (e.g. Hornak et al. 2006
(ff99SB), Nguyen/Roe/Simmerling 2013 (GB + ff99SB)):

- the two major basins — β/PPII (φ<0, ψ high) and αR (φ<0, ψ ~ -40°) —
  are both substantially populated; αL (φ>0) is a minor population;
- the global minimum sits in the φ<0 half-plane;
- crossing the φ≈0 barrier out of the L-alanine region costs several kT.

Tolerances are wide because absolute basin populations differ by several
tens of percent between force fields and solvent models (GB implicit
solvent notably over-stabilizes αR relative to TIP3P); what is being
locked down is the *shape* of the surface — the conformer-level external
anchor the parameter-table audit (test_alp_parameters.py) cannot provide.
"""

import os

import numpy as np
import pytest

ASSET = os.path.join(
    os.path.dirname(__file__), "..", "pita_tpu", "assets",
    "aldp_fes_T300_phipsi.npz",
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(ASSET),
    reason="FES asset not generated yet (scripts/make_fes_asset.py)",
)

KT_300 = 0.0019872041 * 300.0  # kcal/mol


def _load():
    z = np.load(ASSET)
    return np.degrees(z["phi"]).ravel(), np.degrees(z["psi"]).ravel()


def _basin_masks(phi, psi):
    alpha_L = phi > 0
    alpha_R = (phi <= 0) & (psi > -120) & (psi < 40)
    beta_ppii = (phi <= 0) & ~alpha_R
    return beta_ppii, alpha_R, alpha_L


def test_fes_asset_is_long_enough():
    z = np.load(ASSET)
    assert len(z["phi"]) >= 20000, "need a long trajectory for FES estimates"
    assert float(z["total_sim_ps"]) >= 10000.0  # >= 10 ns aggregate


def test_basin_populations_match_literature_shape():
    phi, psi = _load()
    beta, aR, aL = _basin_masks(phi, psi)
    p_beta, p_aR, p_aL = beta.mean(), aR.mean(), aL.mean()
    # both major basins substantially populated (ff99SB/GB literature:
    # beta+PPII 0.3-0.8, alphaR 0.2-0.7 depending on solvent model)
    assert 0.15 < p_beta < 0.9, f"beta/PPII population {p_beta:.3f}"
    assert 0.1 < p_aR < 0.8, f"alphaR population {p_aR:.3f}"
    # alphaL is a minor, rarely-visited basin (<~5-10% in all published FFs)
    assert p_aL < 0.12, f"alphaL population {p_aL:.3f}"


def test_global_minimum_in_negative_phi_halfplane():
    phi, _ = _load()
    hist, edges = np.histogram(phi, bins=72, range=(-180, 180), density=True)
    centers = 0.5 * (edges[1:] + edges[:-1])
    assert centers[np.argmax(hist)] < -30.0


def test_phi_barrier_height_several_kT():
    """The FES along φ has a barrier of several kT between the L-alanine
    region (φ<0) and αL (φ>0) — literature puts the lowest crossing at
    ~4-8 kcal/mol; require ≥1.5 kcal/mol to catch parameter regressions
    without over-fitting the exact height."""
    phi, _ = _load()
    hist, edges = np.histogram(phi, bins=72, range=(-180, 180))
    centers = 0.5 * (edges[1:] + edges[:-1])
    # free energy up to a constant; empty bins = at least as high as the
    # lowest non-zero count implies
    fe = -KT_300 * np.log(np.maximum(hist, 0.5) / hist.sum())
    fe -= fe.min()
    left_min = fe[centers < -30].min()
    # barrier: the ridge in the crossing region around phi ~ 0..+60
    crossing = (centers > -10) & (centers < 80)
    barrier = fe[crossing].min()  # lowest path over the ridge
    assert barrier - left_min > 1.5, (
        f"phi barrier {barrier - left_min:.2f} kcal/mol too low"
    )
