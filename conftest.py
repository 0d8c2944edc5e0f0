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
