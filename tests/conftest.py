"""Test config: run everything on CPU with 8 virtual devices so data-parallel
sharding (shard_map/pjit over a ('data',) mesh) is exercised without a real
multi-chip TPU slice (SURVEY.md §4 "Multi-chip without a cluster").

NOTE: this environment's sitecustomize registers the remote `axon` TPU
backend and force-sets jax_platforms="axon,cpu", overriding JAX_PLATFORMS
from the environment.  Tests must run on local CPU (the tunnel is
rate-limited and serializes compiles), so we re-override it after import.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env is set)

jax.config.update("jax_platforms", "cpu")  # beat sitecustomize's "axon,cpu"

# Persistent compilation cache: CPU test compiles dominate suite time.
jax.config.update("jax_compilation_cache_dir", "/tmp/mwd_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert len(jax.devices()) == 8, jax.devices()
