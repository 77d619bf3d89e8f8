"""Exponential moving average of parameters as a pytree map.

Reference parity: ``pita/src/models/components/ema.py`` — shadow params with
warmup decay ``min(decay, (1+n)/(10+n))`` updated after every optimizer step
(energytemp_module.py:1297-1302), swapped in for evaluation (:803-813). Here
the EMA is just a second pytree + an update count; "backup/copy_to/restore"
becomes choosing which pytree to pass to a pure function.
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    params: Any  # shadow parameters
    num_updates: jnp.ndarray  # int32 scalar


def ema_init(params) -> EMAState:
    return EMAState(params=jax.tree.map(jnp.asarray, params), num_updates=jnp.zeros((), jnp.int32))


def ema_update(state: EMAState, new_params, decay: float) -> EMAState:
    n = state.num_updates + 1
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))  # ema.py:35-38
    shadow = jax.tree.map(lambda s, p: s * d + p * (1.0 - d), state.params, new_params)
    return EMAState(params=shadow, num_updates=n)
