"""Profiling and numerics-debugging hooks.

Reference parity (SURVEY §5.1/§5.2): Lightning profiler configs
(configs/debug/profiler.yaml) → ``jax.profiler`` traces viewable in
Perfetto/TensorBoard; ``detect_anomaly`` (configs/debug/default.yaml:30) →
``jax.debug_nans``/``jax.debug_infs``; plus a block-until-ready timing helper.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace context → open in Perfetto/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def detect_anomaly(nans: bool = True, infs: bool = False):
    """Raise on NaN/Inf production inside jitted code (debug-mode parity)."""
    old_nans = jax.config.jax_debug_nans
    old_infs = jax.config.jax_debug_infs
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)
        jax.config.update("jax_debug_infs", old_infs)


def timed(fn, *args, **kwargs):
    """Run fn, block until device-ready, return (result, seconds)."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0
