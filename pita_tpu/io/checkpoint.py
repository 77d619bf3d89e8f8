"""Checkpoint / resume via orbax.

Reference parity (SURVEY §5.4): Lightning ModelCheckpoint saved model state
*including* the replay buffers (registered as module buffers,
prioritised_replay_buffer.py:21-33) and EMA shadows (ema.py:13-22); resume via
``ckpt_path`` (train.py:99-106); a wall-clock time-interval checkpoint for
preemptible jobs (configs/callbacks/time_checkpoint.yaml:17-20).

Here the checkpoint is one pytree: (params, EMA state, optimizer state, the
stacked per-rung buffers, the PRNG key, the epoch / ladder position) — saved
with orbax and restored into the trainer in place.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _state_pytree(trainer):
    return {
        "params_score": trainer.params_score,
        "params_energy": trainer.params_energy,
        "ema_score": {
            "params": trainer.ema_score.params,
            "num_updates": trainer.ema_score.num_updates,
        },
        "ema_energy": {
            "params": trainer.ema_energy.params,
            "num_updates": trainer.ema_energy.num_updates,
        },
        "opt_state": trainer.opt_state,
        "buffers": trainer.buffers._asdict(),
        "key": trainer.key,
        "epoch": jnp.asarray(trainer.epoch, jnp.int32),
    }


def save_checkpoint(trainer, path: str):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, _state_pytree(trainer), force=True)


def restore_checkpoint(trainer, path: str):
    """Restore in place; tolerates a missing path like train.py:99-104."""
    import orbax.checkpoint as ocp

    from pita_tpu.nets.ema import EMAState
    from pita_tpu.train.buffer import ReplayBuffer

    path = os.path.abspath(path)
    if not os.path.exists(path):
        print(f"checkpoint {path} not found — starting from scratch")
        return trainer
    item = _state_pytree(trainer)
    # restore to HOST numpy: per-array device puts over a tunneled runtime
    # are fragile (observed: worker crash mid-restore); numpy leaves are
    # device-put lazily, in one batch, at the first jitted call
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), item
    )
    with ocp.PyTreeCheckpointer() as ckptr:
        state = ckptr.restore(path, item=item, restore_args=restore_args)
    trainer.params_score = state["params_score"]
    trainer.params_energy = state["params_energy"]
    trainer.ema_score = EMAState(
        params=state["ema_score"]["params"],
        num_updates=state["ema_score"]["num_updates"],
    )
    trainer.ema_energy = EMAState(
        params=state["ema_energy"]["params"],
        num_updates=state["ema_energy"]["num_updates"],
    )
    trainer.opt_state = state["opt_state"]
    trainer.buffers = ReplayBuffer(**state["buffers"])
    trainer.key = state["key"]
    trainer.epoch = int(state["epoch"])
    return trainer


class TimeIntervalCheckpointer:
    """Wall-clock checkpointing for preemptible runs
    (configs/callbacks/time_checkpoint.yaml: every 2h50m)."""

    def __init__(self, trainer, path: str, interval_seconds: float = 2 * 3600 + 50 * 60):
        self.trainer = trainer
        self.path = path
        self.interval = interval_seconds
        self._last = time.time()

    def maybe_save(self):
        if time.time() - self._last >= self.interval:
            save_checkpoint(self.trainer, self.path)
            self._last = time.time()
            return True
        return False
