"""Platform selection helper: make JAX_PLATFORMS=cpu actually win.

The axon TPU plugin registers itself regardless of the env var; an explicit
config update is required before first backend use (see tests/conftest.py)."""

import os


def honor_jax_platforms_env() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    try:
        jax.config.update("jax_platforms", want)
    except Exception:
        pass
