"""Honor an explicitly-set JAX_PLATFORMS env var under pre-imported jax.

This environment pre-imports jax at interpreter start (sitecustomize) with
``JAX_PLATFORMS=axon`` baked into the process env, so prefixing a command
with ``JAX_PLATFORMS=cpu`` is read too late for jax's env-var plumbing.
The backend itself initializes lazily, though, so updating
``jax.config.jax_platforms`` before the first device use still works —
call :func:`honor_platform_env` at CLI entry, before any jax computation.

(SURVEY §4 test-strategy parity: the reference's CPU test paths rely on
Lightning's accelerator selection; our equivalent is this env→config bridge
plus tests/conftest.py's 8-virtual-device CPU mesh.)
"""

import os


def honor_platform_env() -> None:
    """If JAX_PLATFORMS requests a non-default platform, apply it via
    jax.config (a no-op once the backend is already initialized)."""
    want = os.environ.get("JAX_PLATFORMS")
    if not want or want == "axon":
        return
    import jax

    try:
        jax.config.update("jax_platforms", want)
    except RuntimeError:
        # backend already initialized — leave it be (explicit jax use
        # before the CLI entry point wins)
        pass
