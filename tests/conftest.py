"""Test configuration: force an 8-device virtual CPU mesh so all sharding tests
run without TPU hardware (mirrors the multi-chip dry-run the driver performs).

The host environment pins JAX_PLATFORMS=axon (remote TPU tunnel) and a
sitecustomize registers the axon PJRT plugin at interpreter start, overriding
the env var — so we must both set the env BEFORE jax backend init and override
jax.config AFTER import. Without this, every unit test becomes a network round
trip to the TPU relay (~100s each).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache (repo-local, gitignored): CPU test compiles
# replay from disk on reruns — the suite's wall time is mostly XLA compiles.
# Keys include platform + XLA flags, so CPU test entries and the bench's TPU
# entries coexist in one directory. SPATIALTHINKER_NO_CACHE=1 disables.
if os.environ.get("SPATIALTHINKER_NO_CACHE") != "1":
    _cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        pass
