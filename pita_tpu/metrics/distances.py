"""Distribution distances: the evaluation suite.

Reference parity: ``pita/src/models/components/distribution_distances.py`` —
the headline metric is the 1D Wasserstein distance between generated and data
*energy histograms* (``energy_w2 = sqrt(emd2_1d)``, :13-33), plus W1, mean
gaps, threshold-cropped variants at |E| ≤ 1000, and multivariate W1/W2 + MMD
over feature spaces (:44-90); ``optimal_transport.py`` provides torus-
Wasserstein for dihedral angles.

The reference calls POT's network-simplex on CPU; here the 1D distances are
exact sorts on device, multivariate W2 is exact via the Hungarian assignment
(host, for eval-sized batches) with an entropic Sinkhorn alternative that is
pure JAX for on-device use.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def emd2_1d(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact squared 1D W2 between equal-size empirical samples (a sort)."""
    a = jnp.sort(a.ravel())
    b = jnp.sort(b.ravel())
    return jnp.mean((a - b) ** 2)


def wasserstein_1d(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact 1D W1 between equal-size empirical samples."""
    a = jnp.sort(a.ravel())
    b = jnp.sort(b.ravel())
    return jnp.mean(jnp.abs(a - b))


def energy_distances(
    generated_energies,
    data_energies,
    prefix: str = "val",
    energy_threshold: float = 1000.0,
):
    """Energy-histogram distances (distribution_distances.py:13-33).

    Returns {prefix/energy_w2, energy_w1, energy_mean_gap and cropped variants}.
    Cropping masks |E| > threshold in *both* sets before comparing.
    """
    g = jnp.asarray(generated_energies).ravel()
    d = jnp.asarray(data_energies).ravel()
    n = min(g.shape[0], d.shape[0])
    g, d = g[:n], d[:n]
    out = {
        f"{prefix}/energy_w2": float(jnp.sqrt(emd2_1d(g, d))),
        f"{prefix}/energy_w1": float(wasserstein_1d(g, d)),
        f"{prefix}/energy_mean_gap": float(jnp.abs(jnp.mean(g) - jnp.mean(d))),
    }
    gm = np.asarray(g)
    dm = np.asarray(d)
    gm = gm[np.abs(gm) <= energy_threshold]
    dm = dm[np.abs(dm) <= energy_threshold]
    if len(gm) > 0 and len(dm) > 0:
        # masking can drop different fractions from each set; compare the
        # full masked histograms with the exact unequal-size 1D EMD (the
        # reference feeds the masked sets to POT's emd2_1d, which handles
        # unequal sizes — truncating both *sorted* arrays to the shorter
        # length would compare mismatched quantile ranges)
        out[f"{prefix}/energy_w2_cropped"] = float(np.sqrt(emd_1d_unequal(gm, dm, p=2)))
        out[f"{prefix}/energy_w1_cropped"] = float(emd_1d_unequal(gm, dm, p=1))
        out[f"{prefix}/energy_mean_gap_cropped"] = float(abs(gm.mean() - dm.mean()))
    return out


def emd_1d_unequal(a: np.ndarray, b: np.ndarray, p: int = 2) -> float:
    """Exact 1D EMD_p^p between empirical measures of different sizes.

    The optimal 1D coupling transports quantile mass in order: partition [0,1]
    at every k/n and k/m breakpoint; on each sub-interval both quantile
    functions are constant, so the cost is the weighted sum of
    |Q_a(t) − Q_b(t)|^p over sub-intervals (equivalent to POT's emd2_1d with
    uniform weights, used by distribution_distances.py:13-33).
    """
    a = np.sort(np.asarray(a, dtype=np.float64).ravel())
    b = np.sort(np.asarray(b, dtype=np.float64).ravel())
    n, m = len(a), len(b)
    q = np.union1d(np.arange(1, n + 1) / n, np.arange(1, m + 1) / m)
    edges = np.concatenate([[0.0], q])
    w = np.diff(edges)
    mid = (edges[:-1] + edges[1:]) / 2
    ia = np.minimum((mid * n).astype(np.int64), n - 1)
    ib = np.minimum((mid * m).astype(np.int64), m - 1)
    return float(np.sum(w * np.abs(a[ia] - b[ib]) ** p))


def wasserstein2_exact(a: np.ndarray, b: np.ndarray) -> float:
    """Exact W2 between equal-size point clouds via Hungarian assignment.

    Replaces POT's exact EMD (optimal_transport.py ``wasserstein``); host-side,
    O(n³) worst case — use for eval batches (≤ ~4k points).
    """
    from scipy.optimize import linear_sum_assignment

    a, b = np.asarray(a), np.asarray(b)
    cost = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    ri, ci = linear_sum_assignment(cost)
    return float(np.sqrt(cost[ri, ci].mean()))


def wasserstein1_exact(a: np.ndarray, b: np.ndarray) -> float:
    from scipy.optimize import linear_sum_assignment

    a, b = np.asarray(a), np.asarray(b)
    cost = np.sqrt(((a[:, None, :] - b[None, :, :]) ** 2).sum(-1))
    ri, ci = linear_sum_assignment(cost)
    return float(cost[ri, ci].mean())


def sinkhorn_divergence(
    a: jnp.ndarray, b: jnp.ndarray, epsilon: float = 0.05, num_iters: int = 200
) -> jnp.ndarray:
    """Entropic OT cost (on-device alternative to exact EMD; emd.py capability)."""

    def _sink(x, y):
        n, m = x.shape[0], y.shape[0]
        C = jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=-1)
        scale = jnp.maximum(jnp.max(C), 1e-12)
        Cn = C / scale
        f = jnp.zeros(n)
        g = jnp.zeros(m)
        loga = -jnp.log(n) * jnp.ones(n)
        logb = -jnp.log(m) * jnp.ones(m)

        def body(i, fg):
            f, g = fg
            f = -epsilon * jax.scipy.special.logsumexp(
                (g[None, :] - Cn) / epsilon + logb[None, :], axis=1
            )
            g = -epsilon * jax.scipy.special.logsumexp(
                (f[:, None] - Cn) / epsilon + loga[:, None], axis=0
            )
            return (f, g)

        f, g = jax.lax.fori_loop(0, num_iters, body, (f, g))
        P = jnp.exp((f[:, None] + g[None, :] - Cn) / epsilon + loga[:, None] + logb[None, :])
        return jnp.sum(P * C)

    return _sink(a, b)


def torus_wasserstein(angles_a: np.ndarray, angles_b: np.ndarray) -> float:
    """W distance on the torus (dihedral angles, used on φ/ψ; alp_energy.py:290).

    Cost = squared geodesic distance per angle coordinate, exact assignment.
    """
    from scipy.optimize import linear_sum_assignment

    a, b = np.asarray(angles_a), np.asarray(angles_b)
    diff = np.abs(a[:, None, :] - b[None, :, :])
    diff = np.minimum(diff, 2 * np.pi - diff)
    cost = (diff**2).sum(-1)
    ri, ci = linear_sum_assignment(cost)
    return float(np.sqrt(cost[ri, ci].mean()))


def compute_distribution_distances(
    pred: np.ndarray, true: np.ndarray, prefix: Optional[str] = None
):
    """W1/W2 (exact), RBF-mixture MMD, moment gaps over a feature space
    (distribution_distances.py:44-90)."""
    from pita_tpu.metrics.mmd import mix_rbf_mmd2

    pred, true = np.asarray(pred), np.asarray(true)
    n = min(len(pred), len(true))
    pred, true = pred[:n], true[:n]
    names = ["w1", "w2", "mmd_rbf", "mean_mse", "median_mse"]
    vals = [
        wasserstein1_exact(pred, true),
        wasserstein2_exact(pred, true),
        float(mix_rbf_mmd2(jnp.asarray(pred), jnp.asarray(true))),
        float(((pred.mean(0) - true.mean(0)) ** 2).mean()),
        float(((np.median(pred, 0) - np.median(true, 0)) ** 2).mean()),
    ]
    if prefix is not None:
        names = [f"{prefix}/{n}" for n in names]
    return dict(zip(names, vals))


def interatomic_dist_w2(target, generated: jnp.ndarray, data: jnp.ndarray) -> float:
    """sqrt(emd2_1d) over pooled interatomic distances
    (energytemp_module.py:1176-1191)."""
    dg = target.interatomic_dist(generated).ravel()
    dd = target.interatomic_dist(data).ravel()
    n = min(dg.shape[0], dd.shape[0])
    return float(jnp.sqrt(emd2_1d(dg[:n], dd[:n])))
