"""Repo-root conftest: makes `gaustar_tpu` importable and pins tests to a virtual
8-device CPU mesh. Multi-chip sharding is validated on host devices; real-TPU
execution is exercised by bench.py / the driver, not the unit suite.

Note: env vars are not enough here — the ambient environment pins
JAX_PLATFORMS=axon (the TPU tunnel) and jax may already be imported by a pytest
plugin before this file runs, so we go through jax.config, which takes effect as
long as no backend has been initialized yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the suite is dominated by XLA compiles of the
# render pipeline (VERDICT r1 notes >10 min); caching compiled executables on
# disk makes repeat runs fast. Safe on CPU; keyed by HLO + flags + versions.
jax.config.update("jax_compilation_cache_dir", "/tmp/gaustar_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
