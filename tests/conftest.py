"""Test config: force JAX onto a virtual 8-device CPU mesh (no TPU needed).

Mirrors the reference's always-available SW fallback (MFX_IMPL_SOFTWARE,
intel_dec/intel_dec.cpp:394-396) — every test must run hardware-free.
Env vars must be set before jax is imported anywhere.
"""

import os

# Force CPU even if the environment pins a TPU platform (JAX_PLATFORMS=axon):
# unit tests must be hardware-free; benches opt into TPU explicitly. The env
# var alone does not win over an already-registered plugin, so also set the
# config knob before any jax.devices() call.
if os.environ.get("JMX_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Persistent XLA compilation cache (opt-in: JMX_XLA_CACHE=/path). The
# HEVC/H.264 wavefront kernels take minutes to compile on the CPU backend,
# but this jaxlib's cache writer segfaults intermittently (zstandard
# compression of multi-GB CPU executables), so it is NOT on by default.
_CACHE = os.environ.get("JMX_XLA_CACHE", "")
if _CACHE:
    os.makedirs(_CACHE, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
