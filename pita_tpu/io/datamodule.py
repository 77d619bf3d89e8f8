"""Dataset plumbing: download-by-URL with checksum, CoM-likelihood energy
correction, and importance-reweighted histogram figures.

Reference parity: ``pita/src/energies/base_datamodule.py`` —
``prepare_data`` downloads the MD dataset by URL (:63-83), ``energy`` adds an
optional center-of-mass likelihood correction for non-mean-free proposals
(:186-205), and ``get_dataset_fig`` draws interatomic-distance and energy
histograms with softmax importance reweighting of the generated samples
(:362-491). Normalization / CoM-zeroing live on the Target base class here
(targets/base.py:53-125); this module holds the remaining capabilities.
"""

import hashlib
import math
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np


def download_dataset(url: str, path: str, sha256: Optional[str] = None,
                     timeout: float = 300.0) -> str:
    """Fetch a dataset file by URL if absent; verify an optional checksum.

    Reference: base_datamodule.prepare_data (:63-83) — plus integrity
    checking the reference lacks. Raises a clear error when the environment
    has no network egress (this build's default) so callers can fall back to
    generated data.
    """
    if os.path.exists(path):
        if sha256 is not None:
            _verify_checksum(path, sha256)
        return path
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import requests

        response = requests.get(url, timeout=timeout)
        response.raise_for_status()
    except Exception as e:  # no egress / bad URL: explicit, actionable error
        raise RuntimeError(
            f"dataset download failed for {url} ({e}); place the file at "
            f"{path} manually or use a generated dataset"
        ) from e
    tmp = path + ".part"
    with open(tmp, "wb") as f:
        f.write(response.content)
    if sha256 is not None:
        _verify_checksum(tmp, sha256)
    os.replace(tmp, path)
    return path


def _verify_checksum(path: str, sha256: str):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    if h.hexdigest() != sha256:
        raise RuntimeError(
            f"checksum mismatch for {path}: got {h.hexdigest()}, want {sha256}"
        )


def com_energy_correction(x: jnp.ndarray, n_particles: int, n_dim: int,
                          proposal_com_std: float) -> jnp.ndarray:
    """Center-of-mass likelihood correction for non-mean-free proposals.

    When training data is CoM-augmented with an isotropic Gaussian of scale
    ``proposal_com_std``, importance weights against the (CoM-free) target
    need the proposal's CoM radial log-density removed. The correction is the
    negative log of the chi-distributed CoM norm (base_datamodule.py:186-205):

        E_com = |com|²/(2σ²) − log( |com|² / (√2 σ³ Γ(3/2)) ).
    """
    B = x.shape[0]
    com = x.reshape(B, n_particles, n_dim).mean(axis=1)
    com2 = jnp.sum(com**2, axis=-1)
    sigma = proposal_com_std
    return com2 / (2 * sigma**2) - jnp.log(
        com2 / (math.sqrt(2.0) * sigma**3 * math.gamma(1.5))
    )


def importance_weights(target, samples: jnp.ndarray, log_p_samples: jnp.ndarray,
                       use_com_energy: bool = False,
                       proposal_com_std: Optional[float] = None) -> jnp.ndarray:
    """softmax(−E(x) − log q(x)) self-normalized importance weights
    (base_datamodule.py:420-423), optionally with the CoM correction."""
    import jax

    energy = -target.log_prob(samples)
    if use_com_energy:
        assert proposal_com_std is not None
        energy = energy + com_energy_correction(
            samples, target.n_particles, target.n_spatial_dim, proposal_com_std
        )
    logits = -energy.ravel() - jnp.asarray(log_p_samples).ravel()
    return jax.nn.softmax(logits)


def plot_reweighted_histograms(
    target,
    samples,
    log_p_samples,
    data,
    out_dir: str,
    name: str = "reweighted_hist",
    use_com_energy: bool = False,
    proposal_com_std: Optional[float] = None,
    bins: int = 100,
):
    """Interatomic-distance + energy histograms with the generated samples
    both raw and importance-reweighted against the target
    (get_dataset_fig, base_datamodule.py:362-491)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    w = np.asarray(
        importance_weights(
            target, jnp.asarray(samples), log_p_samples,
            use_com_energy=use_com_energy, proposal_com_std=proposal_com_std,
        )
    )
    fig, axs = plt.subplots(1, 2, figsize=(12, 4))
    if getattr(target, "is_molecule", False):
        d_gen = np.asarray(target.interatomic_dist(jnp.asarray(samples)))
        d_data = np.asarray(target.interatomic_dist(jnp.asarray(data)))
        axs[0].hist(d_data.ravel(), bins=bins, density=True, histtype="step",
                    linewidth=3, label="True data", color="g")
        axs[0].hist(d_gen.ravel(), bins=bins, density=True, histtype="step",
                    linewidth=3, label="Proposal", color="r")
        w_dist = np.repeat(w, d_gen.shape[1]) / d_gen.shape[1]
        axs[0].hist(d_gen.ravel(), bins=bins, density=True, histtype="step",
                    linewidth=3, weights=w_dist, label="Reweighted", color="orange")
        axs[0].set_xlabel("Interatomic distance")
        axs[0].legend()
    e_gen = np.asarray(-target.log_prob(jnp.asarray(samples)))
    e_data = np.asarray(-target.log_prob(jnp.asarray(data)))
    lo = float(min(e_data.min(), np.percentile(e_gen, 1)))
    hi = float(max(e_data.max(), np.percentile(e_gen, 99)))
    axs[1].hist(e_data, bins=bins, density=True, histtype="step", linewidth=3,
                range=(lo, hi), label="True data", color="g")
    axs[1].hist(e_gen, bins=bins, density=True, histtype="step", linewidth=3,
                range=(lo, hi), label="Proposal", color="r")
    axs[1].hist(e_gen, bins=bins, density=True, histtype="step", linewidth=3,
                range=(lo, hi), weights=w, label="Reweighted", color="orange")
    axs[1].set_xlabel("Energy")
    axs[1].legend()
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.png")
    fig.savefig(path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return path
