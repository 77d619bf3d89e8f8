"""pita_tpu — a TPU-native JAX framework for Progressive Inference-Time Annealing (PITA).

Rebuilds the capabilities of the reference PyTorch codebase (taraak/pita,
arXiv 2506.16471) as pure ``jit``/``scan``/``vmap`` programs:

- ``targets``    — Boltzmann densities (GMM-40, DW4, LJ13/LJ55, alanine peptides)
                   returning ``(log_prob, force)`` via ``jax.value_and_grad``.
- ``schedules``  — VE noise schedules and annealing-factor schedules γ(t).
- ``nets``       — EDM-preconditioned score/energy networks over MLP / EGNN / DiT
                   backbones (flax.linen), plus pytree EMA.
- ``sampler``    — the annealed reverse-SDE integrator with Feynman–Kac
                   log-weights, systematic SMC resampling and MALA refinement,
                   as a single ``lax.scan`` program.
- ``train``      — the multi-loss score/energy matching objective, replay
                   buffers, the temperature-ladder controller, DEM pretraining.
- ``parallel``   — device-mesh sharding of chains and data-parallel training.
- ``metrics``    — W1/W2 energy distances, MMD, ESS and sampler diagnostics.
"""

__version__ = "0.1.0"


def _enable_persistent_compile_cache():
    """Point JAX at an on-disk compilation cache (idempotent, opt-out via
    JAX_COMPILATION_CACHE_DIR="" ). The sampler programs and the fused Pallas
    kernels have multi-minute first compiles; the cache makes every later
    process start warm."""
    import os

    if "JAX_COMPILATION_CACHE_DIR" in os.environ:
        return  # user decided (set, or explicitly emptied to disable)
    try:
        import jax

        path = os.path.expanduser("~/.cache/pita_tpu/jax")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compile_cache()
