"""Replay buffer as a pure JAX ring buffer.

Reference parity: ``pita/src/models/components/prioritised_replay_buffer.py``
(``SimpleBuffer``, :224-430): fixed-capacity ring holding (x, energy, force),
uniform or energy-prioritized sampling with/without replacement, per-rank
seeded generators, ``get_last_n_inserted``, save/load; lives in checkpoints.

TPU-first design: the buffer is a NamedTuple of device arrays plus write
position and fill count — ``buffer_add``/``buffer_sample`` are pure jittable
functions (donatable), the state checkpoints through orbax like any pytree,
and per-device PRNG folding replaces per-rank torch generators.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ReplayBuffer(NamedTuple):
    x: jnp.ndarray  # (capacity, dim)
    energy: jnp.ndarray  # (capacity,)
    force: jnp.ndarray  # (capacity, dim)
    pos: jnp.ndarray  # int32 next write index
    size: jnp.ndarray  # int32 number of valid entries


def buffer_init(capacity: int, dim: int, dtype=jnp.float32) -> ReplayBuffer:
    return ReplayBuffer(
        x=jnp.zeros((capacity, dim), dtype),
        energy=jnp.zeros((capacity,), dtype),
        force=jnp.zeros((capacity, dim), dtype),
        pos=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
    )


def buffer_add(buf: ReplayBuffer, x, energy, force=None, mask=None) -> ReplayBuffer:
    """Append a batch, wrapping around (SimpleBuffer.add, :285-317).

    ``mask`` (optional, (n,)) marks valid rows (the reference filters
    high-energy samples before inserting, energytemp_module.py:881-901).
    For jit-static shapes, valid rows are stably compacted to the front and
    the cursor advances only past them; masked rows land beyond the cursor
    and are overwritten by the next add.
    """
    n, dim = x.shape
    cap = buf.x.shape[0]
    # a restored checkpoint may carry host-numpy leaves (io/checkpoint.py
    # restores to host); .at indexing needs jax arrays
    if not isinstance(buf.x, jnp.ndarray):
        buf = jax.tree.map(jnp.asarray, buf)
    if force is None:
        force = jnp.zeros_like(x)
    if mask is not None:
        # move valid rows to the front (stable) so the cursor advance covers
        # exactly the valid ones
        order = jnp.argsort(~mask, stable=True)
        x, energy, force = x[order], energy[order], force[order]
        n_valid = jnp.sum(mask.astype(jnp.int32))
    else:
        n_valid = jnp.asarray(n, jnp.int32)
    idx = (buf.pos + jnp.arange(n)) % cap
    write_ok = jnp.arange(n) < n_valid
    new_x = buf.x.at[idx].set(jnp.where(write_ok[:, None], x, buf.x[idx]))
    new_e = buf.energy.at[idx].set(jnp.where(write_ok, energy, buf.energy[idx]))
    new_f = buf.force.at[idx].set(jnp.where(write_ok[:, None], force, buf.force[idx]))
    return ReplayBuffer(
        x=new_x,
        energy=new_e,
        force=new_f,
        pos=(buf.pos + n_valid) % cap,
        size=jnp.minimum(buf.size + n_valid, cap),
    )


def buffer_sample(
    buf: ReplayBuffer,
    key,
    batch_size: int,
    prioritize: bool = False,
    replacement: bool = False,
):
    """Uniform or energy-prioritized sampling (SimpleBuffer.sample, :335-370).

    Semantics match the reference exactly:
    - ``replacement=False`` (the reference class default, :57) draws a uniform
      random subset without replacement (randperm, :363); if ``batch_size``
      exceeds the fill level, the excess indices fall back to with-replacement
      draws (the reference raises instead — it requires a min fill level).
    - ``replacement=True`` (what ``configs/model/energytemp.yaml:37`` sets on
      the PITA main path) draws i.i.d. uniform indices (:355).
    - ``prioritize=True`` samples ∝ softmax(stored log-probs): the ``energy``
      field holds log p values, and the reference uses
      ``Categorical(logits=self.buffer.energy)`` directly (:351-353) —
      *high*-probability samples are preferred. Without replacement this is
      Gumbel-top-k (the reference marks that combination NotImplemented).

    Returns (x, energy, force, idx).
    """
    cap = buf.x.shape[0]
    valid = jnp.arange(cap) < buf.size
    if prioritize:
        logits = jnp.where(valid, buf.energy, -jnp.inf)
        if replacement:
            idx = jax.random.categorical(key, logits, shape=(batch_size,))
        else:
            k_g, k_fall = jax.random.split(key)
            g = jax.random.gumbel(k_g, logits.shape)
            _, idx = jax.lax.top_k(logits + g, batch_size)
            fallback = jax.random.categorical(k_fall, logits, shape=(batch_size,))
            idx = jnp.where(jnp.arange(batch_size) < buf.size, idx, fallback)
    else:
        if replacement:
            idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(buf.size, 1))
        else:
            k_perm, k_fall = jax.random.split(key)
            # random subset without replacement: top-k of i.i.d. uniforms over
            # the valid region (≡ the first batch_size entries of a randperm)
            u = jnp.where(valid, jax.random.uniform(k_perm, (cap,)), -jnp.inf)
            _, idx = jax.lax.top_k(u, batch_size)
            fallback = jax.random.randint(
                k_fall, (batch_size,), 0, jnp.maximum(buf.size, 1)
            )
            idx = jnp.where(jnp.arange(batch_size) < buf.size, idx, fallback)
    return buf.x[idx], buf.energy[idx], buf.force[idx], idx


def buffer_last_n(buf: ReplayBuffer, n: int):
    """The n most recently inserted rows (SimpleBuffer.get_last_n_inserted, :319-333)."""
    cap = buf.x.shape[0]
    idx = (buf.pos - 1 - jnp.arange(n)) % cap
    return buf.x[idx], buf.energy[idx], buf.force[idx]


def stack_buffers(bufs) -> ReplayBuffer:
    """Stack per-temperature buffers along a leading rung axis.

    The reference keeps per-rung buffers in a str-keyed ModuleDict
    (energytemp_module.py:189-191); stacking instead lets a jitted train step
    select the active rung with one dynamic slice (no host branching), which
    is what makes `train_on_all_temps` (energytemp_module.py:703-710) a
    traced-index gather instead of per-step host dispatch.
    """
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs), *bufs)


def buffer_view(bufs: ReplayBuffer, i) -> ReplayBuffer:
    """Select rung ``i`` (static or traced) from a stacked buffer."""
    import jax

    return jax.tree.map(lambda a: a[i], bufs)


def buffer_set(bufs: ReplayBuffer, i: int, buf: ReplayBuffer) -> ReplayBuffer:
    """Write rung ``i`` (static) back into a stacked buffer."""
    import jax

    # a restored checkpoint may carry host-numpy leaves (io/checkpoint.py
    # restores to host); .at indexing needs jax arrays
    return jax.tree.map(lambda a, b: jnp.asarray(a).at[i].set(b), bufs, buf)


class PrioritisedBuffer(NamedTuple):
    """FAB-style (x, log_w, log_q) buffer (prioritised_replay_buffer.py:49-221).

    Samples with probability ∝ exp(log_w) via Gumbel-top-k *without*
    replacement (:36-46); ``adjust`` rescales stored log-weights after a
    flow/params update and invalidates entries whose adjusted weight is
    non-finite (:178-198). DEM/FAB heritage — not on the PITA main path.
    """

    x: jnp.ndarray
    log_w: jnp.ndarray
    log_q: jnp.ndarray
    pos: jnp.ndarray
    size: jnp.ndarray


def prioritised_init(capacity: int, dim: int, dtype=jnp.float32) -> PrioritisedBuffer:
    return PrioritisedBuffer(
        x=jnp.zeros((capacity, dim), dtype),
        log_w=jnp.full((capacity,), -jnp.inf, dtype),
        log_q=jnp.zeros((capacity,), dtype),
        pos=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
    )


def prioritised_add(buf: PrioritisedBuffer, x, log_w, log_q) -> PrioritisedBuffer:
    n = x.shape[0]
    cap = buf.x.shape[0]
    idx = (buf.pos + jnp.arange(n)) % cap
    return PrioritisedBuffer(
        x=buf.x.at[idx].set(x),
        log_w=buf.log_w.at[idx].set(log_w),
        log_q=buf.log_q.at[idx].set(log_q),
        pos=(buf.pos + n) % cap,
        size=jnp.minimum(buf.size + n, cap),
    )


def prioritised_sample(buf: PrioritisedBuffer, key, batch_size: int):
    """Gumbel-top-k: k draws ∝ softmax(log_w) without replacement (:36-46)."""
    valid = jnp.arange(buf.x.shape[0]) < buf.size
    logits = jnp.where(valid, buf.log_w, -jnp.inf)
    g = jax.random.gumbel(key, logits.shape)
    _, idx = jax.lax.top_k(logits + g, batch_size)
    return buf.x[idx], buf.log_w[idx], buf.log_q[idx], idx


def prioritised_adjust(buf: PrioritisedBuffer, log_q_new, idx=None) -> PrioritisedBuffer:
    """Re-weight after a proposal update: w ← w + (q_old - q_new) in log space;
    kill entries whose adjusted weight is non-finite (:178-198)."""
    if idx is None:
        idx = jnp.arange(buf.x.shape[0])
    log_w_new = buf.log_w[idx] + buf.log_q[idx] - log_q_new
    log_w_new = jnp.where(jnp.isfinite(log_w_new), log_w_new, -jnp.inf)
    return buf._replace(
        log_w=buf.log_w.at[idx].set(log_w_new),
        log_q=buf.log_q.at[idx].set(log_q_new),
    )


def buffer_save(buf: ReplayBuffer, path: str):
    """Persist to .npz (SimpleBuffer.save, :389-399)."""
    import numpy as np

    np.savez(
        path,
        x=np.asarray(buf.x),
        energy=np.asarray(buf.energy),
        force=np.asarray(buf.force),
        pos=int(buf.pos),
        size=int(buf.size),
    )


def buffer_load(path: str) -> ReplayBuffer:
    import numpy as np

    z = np.load(path)
    return ReplayBuffer(
        x=jnp.asarray(z["x"]),
        energy=jnp.asarray(z["energy"]),
        force=jnp.asarray(z["force"]),
        pos=jnp.asarray(z["pos"], jnp.int32),
        size=jnp.asarray(z["size"], jnp.int32),
    )
