"""Auxiliary nets + atom features + normalization utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from pita_tpu.nets.extras import (
    SimpleDebugScore,
    ScalingWrapper,
    LambdaWeighter,
    FlowWrapper,
    PISNet,
)
from pita_tpu.nets import MLPBackbone, EGNNBackbone
from pita_tpu.nets.atom_features import peptide_atom_types


def test_simple_debug_score(rng):
    mean = jnp.asarray([1.0, -1.0])
    s = SimpleDebugScore(mean)
    xt = jax.random.normal(rng, (4, 2))
    D, sc = s.denoiser({}, jnp.full((4,), 0.5), xt, 1.0, return_score=True)
    np.testing.assert_allclose(D, jnp.broadcast_to(mean, (4, 2)))
    np.testing.assert_allclose(sc, (D - xt) / 0.5, rtol=1e-5)


def test_scaling_wrapper(rng):
    inner = MLPBackbone(out_dim=2, hidden_size=16, hidden_layers=1, emb_size=8)
    net = ScalingWrapper(backbone=inner, input_scale=2.0, output_scale=3.0)
    x = jax.random.normal(rng, (3, 2))
    params = net.init(rng, jnp.zeros(3), x, jnp.ones(3))
    out = net.apply(params, jnp.zeros(3), x, 1.0)
    inner_params = {"params": params["params"]["backbone"]}
    ref = inner.apply(inner_params, jnp.zeros(3), 2.0 * x, 1.0) * 3.0
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_lambda_weighter():
    lw = LambdaWeighter("edm")
    ht = jnp.asarray([0.5, 2.0])
    np.testing.assert_allclose(lw(ht), (ht + 1) / ht)
    assert float(LambdaWeighter("ones")(ht)[0]) == 1.0


def test_flow_wrapper(rng):
    net = FlowWrapper(MLPBackbone(out_dim=2, hidden_size=16, hidden_layers=1, emb_size=8))
    p = net.init(rng, 2)
    D = net.denoiser(p, jnp.full((3,), 0.5), jax.random.normal(rng, (3, 2)), 1.0)
    assert D.shape == (3, 2)


def test_pis_net(rng):
    net = PISNet(out_dim=2)
    x = jax.random.normal(rng, (3, 2))
    score = -x
    p = net.init(rng, jnp.zeros(3), x, score)
    out = net.apply(p, jnp.full((3,), 0.3), x, score)
    assert out.shape == (3, 2)


def test_peptide_atom_types():
    from pita_tpu.targets.alp import build_peptide_topology

    topo = build_peptide_topology(1)
    types = peptide_atom_types(topo)
    assert len(types) == 22
    names = topo["names"]
    # methyl H's on the same carbon share a type
    idx = {n: i for i, n in enumerate(names[:6])}  # ACE atoms
    assert types[idx["HH31"]] == types[idx["HH32"]] == types[idx["HH33"]]
    # heavy atoms are all distinct
    heavy = [types[i] for i, t in enumerate(topo["types"]) if not t.startswith("H")]
    assert len(set(heavy)) == len(heavy)


def test_egnn_with_atom_types(rng):
    from pita_tpu.targets.alp import build_peptide_topology

    topo = build_peptide_topology(1)
    types = peptide_atom_types(topo)
    net = EGNNBackbone(
        n_particles=22, hidden_nf=16, n_layers=2, atom_types=types
    )
    x = jax.random.normal(rng, (2, 66))
    p = net.init(rng, jnp.zeros(2), x, jnp.ones(2))
    out = net.apply(p, jnp.full((2,), 0.3), x, 1.0)
    assert out.shape == (2, 66)
    assert np.isfinite(np.asarray(out)).all()


def test_target_normalization(rng):
    from pita_tpu.targets import GMM40, LJ13

    g = GMM40()
    g.normalization_min, g.normalization_max = -50.0, 50.0
    x = jax.random.normal(rng, (4, 2)) * 30
    np.testing.assert_allclose(g.unnormalize(g.normalize(x)), x, rtol=1e-5)
    np.testing.assert_allclose(g.normalize(jnp.asarray([[50.0, -50.0]])), [[1.0, -1.0]])

    lj = LJ13()
    lj.data_normalization_factor = 2.0
    xl = jax.random.normal(rng, (4, 39))
    xn = lj.normalize(xl)
    com = xn.reshape(4, 13, 3).mean(axis=1)
    np.testing.assert_allclose(com, 0.0, atol=1e-6)
