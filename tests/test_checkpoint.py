"""Checkpoint/resume round-trip (reference test_train.py:79-107 capability)."""

import numpy as np
import pytest

from tests.test_train_e2e import _make_trainer


@pytest.mark.slow
def test_checkpoint_resume_roundtrip(tmp_path):
    from pita_tpu.io.checkpoint import save_checkpoint, restore_checkpoint

    trainer = _make_trainer(tmp_path / "run1")
    trainer.populate_initial_buffer()
    trainer.train_one_epoch()
    trainer.epoch = 1
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(trainer, ckpt)

    trainer2 = _make_trainer(tmp_path / "run2")
    restore_checkpoint(trainer2, ckpt)
    assert trainer2.epoch == 1
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(trainer.params_score),
        jax.tree_util.tree_leaves(trainer2.params_score),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # buffers restored
    np.testing.assert_array_equal(
        np.asarray(trainer.buffers.size), np.asarray(trainer2.buffers.size)
    )
    # EMA state restored
    assert int(trainer2.ema_score.num_updates) == int(trainer.ema_score.num_updates)
    # training continues from the restored state without error
    aux = trainer2.train_one_epoch()
    assert np.isfinite(aux["loss"])


@pytest.mark.slow
def test_resume_then_rung_transition(tmp_path):
    """The LJ55 ladder-continuation flow: restore (host-numpy leaves,
    io/checkpoint.py:64-68) then hit a rung transition, whose buffer_set
    runs .at[i].set on the restored stacked buffers (ADVICE r2 high)."""
    from pita_tpu.io.checkpoint import save_checkpoint, restore_checkpoint
    from pita_tpu.train.buffer import buffer_view

    trainer = _make_trainer(tmp_path / "run1")
    trainer.populate_initial_buffer()
    trainer.train_one_epoch()
    trainer.epoch = 1
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(trainer, ckpt)

    trainer2 = _make_trainer(tmp_path / "run2")
    restore_checkpoint(trainer2, ckpt)
    # epoch 1 evaluate is the 2.0->1.0 transition (update_temp_epoch=[2]):
    # fills rung 1 via buffer_set on the freshly-restored (numpy-leaf) state
    m = trainer2.evaluate()
    assert int(buffer_view(trainer2.buffers, 1).size) > 0
    assert any("energy_w2" in k for k in m)
    # island-count semantics recorded with the artifact (VERDICT r2 weak #9)
    assert m["val/n_resampling_islands"] == 1.0


@pytest.mark.slow
def test_test_phase_reloads_checkpoint(tmp_path):
    """trainer.test(ckpt_path=...) samples with the SAVED params
    (train.py:110-119 tests from ckpt_path), not in-memory ones."""
    import jax
    from pita_tpu.io.checkpoint import save_checkpoint

    trainer = _make_trainer(tmp_path / "run")
    trainer.populate_initial_buffer()
    trainer.train_one_epoch()
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(trainer, ckpt)
    saved = jax.tree.map(np.asarray, trainer.params_score)
    # corrupt the in-memory params; test() must restore before sampling
    trainer.params_score = jax.tree.map(lambda a: a + 100.0, trainer.params_score)
    trainer.test(ckpt_path=ckpt)
    for a, b in zip(
        jax.tree_util.tree_leaves(saved),
        jax.tree_util.tree_leaves(trainer.params_score),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_missing_path_is_noop(tmp_path):
    from pita_tpu.io.checkpoint import restore_checkpoint

    trainer = _make_trainer(tmp_path)
    restore_checkpoint(trainer, str(tmp_path / "does_not_exist"))
    assert trainer.epoch == 0


def test_dit3d_backbone_shapes(rng):
    import jax.numpy as jnp

    from pita_tpu.nets import DiT3DBackbone, ScoreWrapper

    net = DiT3DBackbone(n_particles=13, hidden_size=64, cond_dim=64, n_heads=4, n_blocks=2)
    sw = ScoreWrapper(net)
    params = sw.init(rng, 39)
    import jax

    ht = jnp.full((4,), 0.5)
    xt = jax.random.normal(rng, (4, 39))
    D = sw.denoiser(params, ht, xt, 1.0)
    assert D.shape == (4, 39)
    assert np.isfinite(np.asarray(D)).all()
    # zero-init final layer ⇒ backbone output starts at 0 ⇒ D == c_s·x exactly
    c_s = 1.0 / (1.0 + 0.5)
    np.testing.assert_allclose(np.asarray(D), c_s * np.asarray(xt), rtol=1e-5)
