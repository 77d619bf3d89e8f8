"""CNF/NLL machinery (reference cnf.py capability): with the analytic
Gaussian score, the CNF NLL must equal the exact Gaussian NLL."""

import jax
import jax.numpy as jnp
import numpy as np

from pita_tpu.sampler.cnf import cnf_nll
from tests.test_sampler import AnalyticScore, SIGMA0_SQ, SCHED


def test_cnf_exact_nll_on_gaussian(rng):
    import math

    x0 = jax.random.normal(rng, (64, 2)) * np.sqrt(SIGMA0_SQ)
    res = cnf_nll(
        jax.random.fold_in(rng, 1), x0, AnalyticScore(), {}, SCHED,
        num_steps=200, exact=True,
    )
    d = 2
    true_nll = 0.5 * jnp.sum(x0**2, axis=-1) / SIGMA0_SQ + 0.5 * d * math.log(
        2 * math.pi * SIGMA0_SQ
    )
    np.testing.assert_allclose(np.asarray(res.nll), np.asarray(true_nll), rtol=0.05, atol=0.05)


def test_cnf_hutchinson_close_to_exact(rng):
    x0 = jax.random.normal(rng, (32, 2))
    exact = cnf_nll(
        jax.random.fold_in(rng, 1), x0, AnalyticScore(), {}, SCHED,
        num_steps=100, exact=True,
    )
    hutch = cnf_nll(
        jax.random.fold_in(rng, 1), x0, AnalyticScore(), {}, SCHED,
        num_steps=100, exact=False, hutchinson_probes=64,
    )
    np.testing.assert_allclose(
        np.asarray(hutch.nll), np.asarray(exact.nll), rtol=0.1, atol=0.2
    )
