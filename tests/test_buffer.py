"""Replay buffer: ring semantics, masking, prioritized sampling, stacking."""

import jax
import jax.numpy as jnp
import numpy as np

from pita_tpu.train.buffer import (
    ReplayBuffer,
    buffer_add,
    buffer_init,
    buffer_sample,
    buffer_last_n,
    buffer_save,
    buffer_load,
    stack_buffers,
    buffer_view,
    buffer_set,
)


def test_add_and_sample(rng):
    buf = buffer_init(100, 3)
    x = jnp.arange(30, dtype=jnp.float32).reshape(10, 3)
    e = jnp.arange(10, dtype=jnp.float32)
    buf = buffer_add(buf, x, e, jnp.ones_like(x))
    assert int(buf.size) == 10 and int(buf.pos) == 10
    xs, es, fs, idx = buffer_sample(buf, rng, 64)
    assert xs.shape == (64, 3)
    assert int(idx.max()) < 10  # only valid region sampled


def test_ring_wraparound():
    buf = buffer_init(16, 2)
    for i in range(5):
        x = jnp.full((7, 2), float(i))
        buf = buffer_add(buf, x, jnp.full((7,), float(i)))
    assert int(buf.size) == 16
    assert int(buf.pos) == (5 * 7) % 16
    # newest entries present
    x_last, e_last, _ = buffer_last_n(buf, 7)
    np.testing.assert_allclose(e_last, 4.0)


def test_masked_add():
    buf = buffer_init(32, 2)
    x = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
    e = jnp.arange(6, dtype=jnp.float32)
    mask = jnp.asarray([True, False, True, True, False, True])
    buf = buffer_add(buf, x, e, mask=mask)
    assert int(buf.size) == 4
    kept = set(np.asarray(buf.energy[:4]).tolist())
    assert kept == {0.0, 2.0, 3.0, 5.0}


def test_prioritized_sampling_prefers_high_log_prob(rng):
    # the energy field stores log p; reference samples Categorical(logits=energy)
    # (prioritised_replay_buffer.py:351-353) => HIGH log p preferred
    buf = buffer_init(64, 1)
    x = jnp.zeros((64, 1))
    e = jnp.concatenate([jnp.zeros(32), jnp.full((32,), 50.0)])
    buf = buffer_add(buf, x, e)
    _, es, _, _ = buffer_sample(buf, rng, 512, prioritize=True, replacement=True)
    assert float((es == 50.0).mean()) > 0.95


def test_save_load_roundtrip(tmp_path):
    buf = buffer_init(8, 2)
    buf = buffer_add(buf, jnp.ones((3, 2)), jnp.ones(3))
    p = str(tmp_path / "buf.npz")
    buffer_save(buf, p)
    buf2 = buffer_load(p)
    np.testing.assert_allclose(buf.x, buf2.x)
    assert int(buf2.size) == 3


def test_stacked_buffers_dynamic_view(rng):
    bufs = [buffer_init(16, 2) for _ in range(3)]
    bufs[1] = buffer_add(bufs[1], jnp.full((4, 2), 7.0), jnp.full((4,), 7.0))
    stacked = stack_buffers(bufs)
    # static view
    v1 = buffer_view(stacked, 1)
    assert int(v1.size) == 4
    # traced view inside jit
    @jax.jit
    def sample_at(stacked, i, key):
        v = buffer_view(stacked, i)
        return buffer_sample(v, key, 8)[0]

    xs = sample_at(stacked, jnp.asarray(1), rng)
    np.testing.assert_allclose(xs, 7.0)
    # write-back
    stacked = buffer_set(stacked, 2, buffer_add(buffer_view(stacked, 2), jnp.zeros((2, 2)), jnp.zeros(2)))
    assert int(buffer_view(stacked, 2).size) == 2


def test_prioritised_buffer_gumbel_topk(rng):
    from pita_tpu.train.buffer import (
        prioritised_init,
        prioritised_add,
        prioritised_sample,
        prioritised_adjust,
    )

    buf = prioritised_init(64, 2)
    x = jnp.arange(32, dtype=jnp.float32).reshape(16, 2)
    log_w = jnp.concatenate([jnp.zeros(8), jnp.full((8,), -100.0)])
    buf = prioritised_add(buf, x, log_w, jnp.zeros(16))
    xs, lw, lq, idx = prioritised_sample(buf, rng, 8)
    # without replacement + dominant weights => exactly the 8 high-weight rows
    assert sorted(np.asarray(idx).tolist()) == list(range(8))
    # adjust: new log_q increases => weights shift; non-finite killed
    buf = prioritised_adjust(buf, jnp.full((64,), jnp.inf))
    assert bool(jnp.all(buf.log_w == -jnp.inf))


def test_sample_without_replacement_no_duplicates(rng):
    """Reference class default: randperm subset (prioritised_replay_buffer.py:363)."""
    buf = buffer_init(64, 2)
    buf = buffer_add(buf, jnp.arange(64, dtype=jnp.float32).reshape(32, 2), jnp.zeros(32))
    _, _, _, idx = buffer_sample(buf, rng, 16, replacement=False)
    idx = np.asarray(idx)
    assert len(np.unique(idx)) == 16  # no duplicates
    assert idx.max() < 32  # only valid region


def test_sample_without_replacement_overdraw_falls_back(rng):
    buf = buffer_init(64, 2)
    buf = buffer_add(buf, jnp.ones((4, 2)), jnp.zeros(4))
    xs, _, _, idx = buffer_sample(buf, rng, 16, replacement=False)
    idx = np.asarray(idx)
    assert idx.max() < 4  # never reads uninitialized rows
    np.testing.assert_allclose(xs, 1.0)


def test_prioritized_prefers_high_log_prob(rng):
    """Reference: Categorical(logits=buffer.energy) where energy stores log p
    (prioritised_replay_buffer.py:351-353) — HIGH log-prob rows dominate."""
    buf = buffer_init(64, 1)
    # rows 0..15: log_prob -100 (bad); rows 16..31: log_prob 0 (good)
    x = jnp.arange(32, dtype=jnp.float32).reshape(32, 1)
    logp = jnp.concatenate([jnp.full((16,), -100.0), jnp.zeros(16)])
    buf = buffer_add(buf, x, logp)
    _, _, _, idx = buffer_sample(buf, rng, 64, prioritize=True, replacement=True)
    assert np.asarray(idx).min() >= 16  # only the high-log-prob half is drawn
    _, _, _, idx2 = buffer_sample(
        buf, jax.random.fold_in(rng, 1), 16, prioritize=True, replacement=False
    )
    idx2 = np.asarray(idx2)
    assert idx2.min() >= 16 and len(np.unique(idx2)) == 16
