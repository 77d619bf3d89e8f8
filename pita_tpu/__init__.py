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
