"""Plotting: the reference's evaluation figures, saved as PNGs.

Reference parity: energy/interatomic-distance histograms vs test data incl.
the not-resampled overlay (base_molecule_energy_function.py:160-254), GMM
contours + sample scatter (gmm_energy.py:181-254, fab plot_contours),
Ramachandran φ/ψ densities with free-energy colorbars (alp_energy.py:301-431),
TICA densities (tica.py:42-51), and the sampler diagnostics the module logs
every eval (energytemp_module.py:1083-1222): per-step log-weights, their std,
unique-ancestor counts, MALA acceptance, SDE-term std curves, the annealing
γ(t) curve.
"""

import os

import numpy as np


def _save(fig, out_dir, name):
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.png")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_energy_histograms(
    generated_energies,
    data_energies,
    out_dir,
    name="energy_hist",
    not_resampled_energies=None,
    max_bins=100,
):
    """Generated-vs-data energy histogram (base_molecule_energy_function.py:160-254)."""
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4))
    g = np.asarray(generated_energies).ravel()
    d = np.asarray(data_energies).ravel()
    lo = min(np.percentile(g, 1), np.percentile(d, 1))
    hi = max(np.percentile(g, 99), np.percentile(d, 99))
    bins = np.linspace(lo, hi, max_bins)
    ax.hist(d, bins=bins, density=True, alpha=0.5, label="data")
    ax.hist(g, bins=bins, density=True, alpha=0.5, label="generated")
    if not_resampled_energies is not None:
        ax.hist(
            np.asarray(not_resampled_energies).ravel(), bins=bins, density=True,
            histtype="step", label="not resampled",
        )
    ax.set_xlabel("energy")
    ax.legend()
    return _save(fig, out_dir, name)


def plot_interatomic_distances(target, generated, data, out_dir, name="dist_hist"):
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4))
    dg = np.asarray(target.interatomic_dist(generated)).ravel()
    dd = np.asarray(target.interatomic_dist(data)).ravel()
    bins = np.linspace(0, np.percentile(dd, 99.5) * 1.2, 100)
    ax.hist(dd, bins=bins, density=True, alpha=0.5, label="data")
    ax.hist(dg, bins=bins, density=True, alpha=0.5, label="generated")
    ax.set_xlabel("interatomic distance")
    ax.legend()
    return _save(fig, out_dir, name)


def plot_gmm_contours(gmm, samples, out_dir, name="gmm_samples", bounds=(-56, 56),
                      grid_n=200, n_contours=50):
    """Contours of the GMM log-density + sample scatter (gmm_energy.py:181-254)."""
    import jax.numpy as jnp
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6))
    xs = np.linspace(*bounds, grid_n)
    gx, gy = np.meshgrid(xs, xs)
    grid = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], -1))
    lp = np.asarray(gmm.log_prob(grid)).reshape(grid_n, grid_n)
    ax.contour(gx, gy, lp, levels=n_contours)
    s = np.asarray(samples)
    s = np.clip(s, bounds[0], bounds[1])
    ax.scatter(s[:, 0], s[:, 1], s=2, alpha=0.4, c="red")
    ax.set_xlim(bounds)
    ax.set_ylim(bounds)
    return _save(fig, out_dir, name)


def plot_ramachandran(phi, psi, out_dir, name="ramachandran", temperature=None):
    """φ/ψ density with free-energy colorbar (alp_energy.py:301-431)."""
    import matplotlib.pyplot as plt

    phi = np.asarray(phi).ravel()
    psi = np.asarray(psi).ravel()
    fig, ax = plt.subplots(figsize=(5.5, 5))
    h, xe, ye = np.histogram2d(
        phi, psi, bins=64, range=[[-np.pi, np.pi], [-np.pi, np.pi]], density=True
    )
    free_energy = -np.log(h.T + 1e-9)
    free_energy -= free_energy.min()
    im = ax.imshow(
        free_energy, origin="lower", extent=[-np.pi, np.pi, -np.pi, np.pi],
        aspect="auto", cmap="viridis",
    )
    fig.colorbar(im, ax=ax, label="free energy [kT]")
    ax.set_xlabel(r"$\phi$")
    ax.set_ylabel(r"$\psi$")
    if temperature is not None:
        ax.set_title(f"T = {temperature:g} K")
    return _save(fig, out_dir, name)


def plot_tica_density(proj_data, out_dir, name="tica", proj_generated=None):
    """Density in the first two TICA components (tica.py:42-51)."""
    import matplotlib.pyplot as plt

    n = 2 if proj_generated is not None else 1
    fig, axs = plt.subplots(1, n, figsize=(5.5 * n, 4.5), squeeze=False)
    for ax, proj, title in zip(
        axs[0],
        [proj_data] + ([proj_generated] if proj_generated is not None else []),
        ["data", "generated"],
    ):
        p = np.asarray(proj)
        ax.hist2d(p[:, 0], p[:, 1], bins=64, cmap="viridis")
        ax.set_xlabel("TIC 1")
        ax.set_ylabel("TIC 2")
        ax.set_title(title)
    return _save(fig, out_dir, name)


def plot_logweights(logweights, out_dir, name="logweights", n_show=15):
    """Per-step log-weight trajectories (energytemp_module.py:1100-1115)."""
    import matplotlib.pyplot as plt

    lw = np.asarray(logweights)
    fig, axs = plt.subplots(1, 2, figsize=(12, 4))
    times = np.linspace(1, 0, lw.shape[0])
    rng = np.random.default_rng(0)
    idx = rng.integers(0, lw.shape[1], n_show)
    axs[0].plot(times, lw[:, idx])
    axs[0].set_xlabel("integration time")
    axs[0].set_title("log-weights")
    axs[1].plot(times, lw.std(axis=1))
    axs[1].set_xlabel("integration time")
    axs[1].set_title("std of log-weights")
    return _save(fig, out_dir, name)


def plot_num_unique(num_unique, out_dir, name="num_unique_idxs"):
    import matplotlib.pyplot as plt

    nu = np.asarray(num_unique)
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(np.linspace(1, 0, len(nu)), nu)
    ax.set_xlabel("integration time")
    ax.set_ylabel("# unique ancestors")
    return _save(fig, out_dir, name)


def plot_acceptance(acceptance_rates, out_dir, name="acceptance_rate"):
    import matplotlib.pyplot as plt

    a = np.asarray(acceptance_rates)
    if a.size == 0:
        return None
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(a)
    ax.set_xlabel("MALA step")
    ax.set_ylabel("acceptance rate")
    return _save(fig, out_dir, name)


def plot_sde_term_stats(term_stats: dict, out_dir, name="sde_terms"):
    """Std-over-time curves of divergence / cross / dU_dt (:1132-1155)."""
    import matplotlib.pyplot as plt

    keys = [k for k, v in term_stats.items() if np.asarray(v).ndim == 1]
    if not keys:
        return None
    fig, axs = plt.subplots(1, len(keys), figsize=(5 * len(keys), 3.5), squeeze=False)
    for ax, k in zip(axs[0], keys):
        v = np.asarray(term_stats[k])
        ax.plot(np.linspace(1, 0, len(v)), v)
        ax.set_xlabel("integration time")
        ax.set_title(f"std({k})")
    return _save(fig, out_dir, name)


def plot_annealing_schedule(annealing_schedule, num_steps, out_dir, name="annealing_factor"):
    import jax.numpy as jnp
    import matplotlib.pyplot as plt

    t = np.linspace(1, 0, num_steps)
    g = np.asarray(annealing_schedule.gamma(jnp.asarray(t)))
    fig, ax = plt.subplots(figsize=(7, 3.5))
    ax.plot(t, g)
    ax.set_xlabel("integration time")
    ax.set_ylabel(r"$\gamma(t)$")
    return _save(fig, out_dir, name)
