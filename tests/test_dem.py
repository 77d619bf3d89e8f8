"""DEM pretraining path (reference energytemp_module.py:567-618,769-800)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pita_tpu.train.dem import DEMConfig, pretrain_loss
from pita_tpu.nets import MLPBackbone, ScoreWrapper
from pita_tpu.targets import GMM40


def test_pretrain_loss_both_modes(rng):
    gmm = GMM40()
    sw = ScoreWrapper(MLPBackbone(out_dim=2, hidden_size=32, hidden_layers=2, emb_size=16))
    ps = sw.init(rng, 2)
    x0 = gmm.sample(jax.random.fold_in(rng, 1), 16)
    _, f0 = gmm.log_prob_and_force(x0)
    dem = DEMConfig(num_training_epochs=1, num_mc_samples=64)
    l_force = pretrain_loss(sw, ps, dem, jax.random.fold_in(rng, 2), x0, f0, 1.0)
    assert np.isfinite(float(l_force))
    dem_mc = dem.replace(use_mc_target=True)
    l_mc = pretrain_loss(
        sw, ps, dem_mc, jax.random.fold_in(rng, 2), x0, f0, 1.0, target=gmm
    )
    assert np.isfinite(float(l_mc))
    # gradient flows
    g = jax.grad(
        lambda p: pretrain_loss(sw, p, dem, jax.random.fold_in(rng, 2), x0, f0, 1.0)
    )(ps)
    import optax

    assert float(optax.global_norm(g)) > 0


@pytest.mark.slow
def test_dem_phase_in_fit(tmp_path):
    """fit() runs DEM epochs first (prior-initialized buffer), then refills
    buffer 0 via plain reverse-SDE sampling."""
    from tests.test_train_e2e import _make_trainer
    from pita_tpu.train.buffer import buffer_view

    dem = DEMConfig(
        num_training_epochs=2,
        training_batch_size=32,
        num_samples_to_generate_per_epoch=64,
        num_integration_steps=8,
        check_val_every_n_epochs=1,
    )
    trainer = _make_trainer(tmp_path)
    trainer.dem_cfg = dem
    trainer.cfg = trainer.cfg.replace(dem_num_training_epochs=2)
    # recompute ladder offsets like __init__ does
    trainer.update_temp_epoch = (
        np.cumsum(trainer.cfg.num_epochs_per_temp) + 2
    )
    size_before = int(buffer_view(trainer.buffers, 0).size)
    trainer.fit(max_epochs=2)
    assert int(buffer_view(trainer.buffers, 0).size) > size_before
    assert any("pretrain" in str(k) or "dem" in str(k) for m in trainer.metrics_history for k in m)
