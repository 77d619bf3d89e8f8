"""Replay-buffer state sharded over the device mesh.

The reference replicates its replay buffers on every DDP rank
(``prioritised_replay_buffer.py:21-33`` — registered as module buffers, so
DDP broadcast keeps full copies everywhere). That caps buffer capacity at
one device's memory. Here the buffer's capacity axis is sharded over the
mesh: each device holds ``capacity / n_devices`` rows, so >10⁶-chain
capacities scale with the mesh while ``pos``/``size`` stay replicated.

The ops are the SAME pure functions as ``pita_tpu.train.buffer`` — sharding
is purely a jit-annotation concern (TPU-first design: XLA partitions the
ring-buffer scatter and the sampling gather; the Gumbel-top-k in
prioritized sampling becomes a sharded reduce). Semantics are bit-identical
to the single-device buffer because the PRNG key is replicated
(tests/test_parallel.py asserts equality).
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pita_tpu.train.buffer import ReplayBuffer, buffer_add, buffer_sample


class ShardedBufferOps:
    """Jitted buffer ops with the capacity axis sharded over ``mesh``.

    Usage::

        ops = ShardedBufferOps(mesh)
        buf = ops.place(buffer_init(capacity, dim))   # rows split over mesh
        buf = ops.add(buf, x, energy, force)          # scatter, stays sharded
        x, e, f, idx = ops.sample(buf, key, 256)      # gather, replicated out
    """

    def __init__(self, mesh, axis_name=None):
        self.mesh = mesh
        axis_name = axis_name or mesh.axis_names[0]
        self._rows = NamedSharding(mesh, P(axis_name))
        self._repl = NamedSharding(mesh, P())
        buf_sh = ReplayBuffer(
            x=self._rows, energy=self._rows, force=self._rows,
            pos=self._repl, size=self._repl,
        )
        self._add = jax.jit(
            lambda buf, x, e, f: buffer_add(buf, x, e, f),
            in_shardings=(buf_sh, self._repl, self._repl, self._repl),
            out_shardings=buf_sh,
            donate_argnums=(0,),
        )
        self._add_masked = jax.jit(
            lambda buf, x, e, f, m: buffer_add(buf, x, e, f, mask=m),
            in_shardings=(buf_sh, self._repl, self._repl, self._repl, self._repl),
            out_shardings=buf_sh,
            donate_argnums=(0,),
        )
        self._sample = jax.jit(
            lambda buf, key, batch_size, prioritize, replacement: buffer_sample(
                buf, key, batch_size, prioritize=prioritize, replacement=replacement
            ),
            static_argnums=(2, 3, 4),
            in_shardings=(buf_sh, self._repl),
            out_shardings=self._repl,
        )
        self._buf_sh = buf_sh

    def place(self, buf: ReplayBuffer) -> ReplayBuffer:
        cap = buf.x.shape[0]
        assert cap % self.mesh.size == 0, (
            f"buffer capacity {cap} must be divisible by the mesh size {self.mesh.size}"
        )
        return jax.tree.map(
            lambda a, sh: jax.device_put(jnp.asarray(a), sh), buf, self._buf_sh
        )

    def add(self, buf, x, energy, force=None, mask=None) -> ReplayBuffer:
        if force is None:
            force = jnp.zeros_like(x)
        if mask is None:
            return self._add(buf, x, energy, force)
        return self._add_masked(buf, x, energy, force, mask)

    def sample(self, buf, key, batch_size: int, prioritize=False, replacement=False):
        return self._sample(buf, key, batch_size, prioritize, replacement)

    def rows_per_device(self, buf) -> int:
        return buf.x.shape[0] // self.mesh.size
