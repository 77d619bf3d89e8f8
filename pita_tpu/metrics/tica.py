"""TICA (time-lagged independent component analysis), self-contained.

Reference parity: ``pita/src/energies/components/tica.py`` — deeptime TICA on
dihedral(sin/cos) + CA-distance features with density plots of the first two
ICs. Rebuilt without deeptime: the generalized symmetric eigenproblem
``C_τ v = λ C_0 v`` solved directly (scipy), optional symmetrized lagged
covariance (the reweighting-free core of deeptime's estimator).
"""

from typing import NamedTuple, Optional

import numpy as np


class TICAModel(NamedTuple):
    mean: np.ndarray
    components: np.ndarray  # (d, k) projection matrix
    eigenvalues: np.ndarray
    lagtime: int

    def transform(self, features: np.ndarray) -> np.ndarray:
        return (features - self.mean) @ self.components


def tica_fit(features: np.ndarray, lagtime: int = 10, dim: int = 2, eps: float = 1e-6):
    """Fit TICA on (T, d) time-ordered features (tica.py:54-59 capability)."""
    from scipy.linalg import eigh

    X = np.asarray(features, np.float64)
    mean = X.mean(axis=0)
    X = X - mean
    T = X.shape[0]
    assert T > lagtime, "trajectory shorter than the lag time"
    X0, Xt = X[:-lagtime], X[lagtime:]
    C0 = (X0.T @ X0 + Xt.T @ Xt) / (2 * (T - lagtime))
    Ct = (X0.T @ Xt + Xt.T @ X0) / (2 * (T - lagtime))  # symmetrized
    C0 = C0 + eps * np.eye(C0.shape[0])
    w, v = eigh(Ct, C0)
    order = np.argsort(w)[::-1]
    w, v = w[order][:dim], v[:, order][:, :dim]
    return TICAModel(mean=mean, components=v, eigenvalues=w, lagtime=lagtime)


def tica_features(target, x: np.ndarray) -> np.ndarray:
    """Dihedral sin/cos + CA-distance features (reference tica_features).

    target: an ALPEnergy-like object with .dihedrals and .topology.
    x: (T, dim) flattened nm coordinates.
    """
    import jax.numpy as jnp

    phi, psi = target.dihedrals(jnp.asarray(x))
    phi, psi = np.asarray(phi), np.asarray(psi)
    feats = [np.sin(phi), np.cos(phi), np.sin(psi), np.cos(psi)]
    # CA pairwise distances
    names = target.topology["names"]
    ca = [i for i, n in enumerate(names) if n == "CA"]
    if len(ca) >= 2:
        xr = np.asarray(x).reshape(len(x), -1, 3)
        for i in range(len(ca)):
            for j in range(i + 1, len(ca)):
                feats.append(
                    np.linalg.norm(xr[:, ca[i]] - xr[:, ca[j]], axis=-1)[:, None]
                )
    return np.concatenate(feats, axis=-1)


def run_tica(target, data: np.ndarray, generated: Optional[np.ndarray] = None,
             lagtime: int = 10, dim: int = 2):
    """Fit on data features, project both sets (reference run_tica)."""
    f_data = tica_features(target, data)
    model = tica_fit(f_data, lagtime=lagtime, dim=dim)
    out = {"model": model, "data_proj": model.transform(f_data)}
    if generated is not None:
        out["generated_proj"] = model.transform(tica_features(target, generated))
    return out
