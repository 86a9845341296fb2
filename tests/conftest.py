"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding tests run on host-emulated devices
(--xla_force_host_platform_device_count) so the sharded NTT is testable
without a pod. Set HEXL_TPU_TEST_PLATFORM=tpu to run against real hardware.
"""

import os

if os.environ.get("HEXL_TPU_TEST_PLATFORM", "cpu") == "cpu":
    # Force CPU even when the session env points JAX at a TPU tunnel
    # (e.g. a PJRT plugin registered from sitecustomize that overrides
    # JAX_PLATFORMS) — unit tests must not depend on hardware.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax  # noqa: E402  (must set config before any test imports jax)

    jax.config.update("jax_platforms", "cpu")
    # float64 for the FFT-like (CKKS encode/decode) tests; the integer
    # kernels use explicit uint32 dtypes and are unaffected.
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the staged NTT graphs are compile-heavy;
# cache them across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hexl_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
