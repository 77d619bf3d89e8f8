"""Dataset plumbing: download/checksum, CoM correction, reweighted figures
(reference base_datamodule.py capabilities)."""

import hashlib
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pita_tpu.io.datamodule import (
    com_energy_correction,
    download_dataset,
    importance_weights,
    plot_reweighted_histograms,
)


def test_download_existing_file_verifies_checksum(tmp_path):
    p = tmp_path / "data.npy"
    np.save(p, np.ones(3))
    digest = hashlib.sha256(p.read_bytes()).hexdigest()
    assert download_dataset("http://unused", str(p), sha256=digest) == str(p)
    with pytest.raises(RuntimeError, match="checksum mismatch"):
        download_dataset("http://unused", str(p), sha256="0" * 64)


def test_download_without_egress_raises_actionable_error(tmp_path):
    with pytest.raises(RuntimeError, match="download failed"):
        download_dataset(
            "http://127.0.0.1:1/none.npy", str(tmp_path / "none.npy"), timeout=0.2
        )


def test_com_energy_correction_formula():
    # one sample with a known CoM: 4 particles all at (1, 0, 0) → com = (1,0,0)
    x = jnp.tile(jnp.asarray([1.0, 0.0, 0.0]), (1, 4))
    sigma = 0.5
    got = float(com_energy_correction(x, 4, 3, sigma)[0])
    want = 1.0 / (2 * sigma**2) - math.log(
        1.0 / (math.sqrt(2) * sigma**3 * math.gamma(1.5))
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_importance_weights_uniform_when_matched():
    from pita_tpu.targets import GMM40 as GMM

    g = GMM()
    key = jax.random.PRNGKey(0)
    x = g.sample_val_set(key, 64)
    # log q == log p → uniform weights
    w = importance_weights(g, x, g.log_prob(x))
    np.testing.assert_allclose(np.asarray(w), 1.0 / 64, rtol=1e-4)


def test_plot_reweighted_histograms(tmp_path):
    from pita_tpu.targets import LJ13

    t = LJ13()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (64, t.dim)) * 0.5
    d = jax.random.normal(jax.random.fold_in(key, 1), (64, t.dim)) * 0.5
    path = plot_reweighted_histograms(
        t, x, t.log_prob(x), d, str(tmp_path), use_com_energy=True,
        proposal_com_std=0.1,
    )
    import os

    assert os.path.exists(path)
