"""Test config: run everything on CPU with 8 virtual devices so data-parallel
sharding (shard_map/pjit over a ('data',) mesh) is exercised without a real
multi-chip TPU slice (SURVEY.md §4 "Multi-chip without a cluster")."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env is set)

jax.config.update("jax_debug_nans", False)  # enabled per-test where useful

# Persistent compilation cache: CPU test compiles dominate suite time.
jax.config.update("jax_compilation_cache_dir", "/tmp/mwd_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
