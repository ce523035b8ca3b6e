"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs the multichip
path; see __graft_entry__.py).

NOTE: this image's sitecustomize registers the axon TPU PJRT plugin and sets
``jax_platforms="axon,cpu"`` programmatically in every process, overriding the
JAX_PLATFORMS env var — so the CPU selection must also be a config update
*after* importing jax.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compilation cache: reruns of the (compile-heavy) suite skip XLA compiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
