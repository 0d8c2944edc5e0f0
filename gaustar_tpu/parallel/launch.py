"""Multi-host runtime bootstrap: jax.distributed + global device meshes.

The reference is strictly single-GPU (no torch.distributed anywhere, SURVEY
§2.1); this module is the TPU-native runtime entry for pod slices. Typical use
on each host of a slice:

    from gaustar_tpu.parallel import launch
    launch.initialize()                       # env-driven (TPU pods auto-detect)
    mesh = launch.make_mesh(gauss=2)          # ("cam", "gauss") 2D mesh
    # cameras shard over "cam" (DP over views, gradients psum over ICI+DCN),
    # gaussians/tiles over "gauss" (model parallelism, parallel/gauss_shard.py)

On TPU pods `jax.distributed.initialize()` discovers the coordinator from the
environment; for CPU/GPU clusters pass coordinator_address/num_processes/
process_id explicitly. Calling initialize() in a single-process session is a
no-op, so the same script runs unchanged from one chip to N hosts.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

_initialized = False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> bool:
    """Initialize the multi-process JAX runtime (idempotent).

    Returns True if a multi-process runtime was (or already is) initialized,
    False when running single-process (no coordinator configured)."""
    global _initialized
    if _initialized:
        return True
    env_coord = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    on_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if coordinator_address is None and not env_coord and not on_pod:
        if num_processes is None or num_processes <= 1:
            return False  # single-process: nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    return True


def make_mesh(gauss: int = 1, cam: int | None = None, devices=None) -> Mesh:
    """Global ("cam", "gauss") mesh over all processes' devices.

    `gauss` is the model-parallel degree (gaussian/tile sharding,
    parallel/gauss_shard.py); the camera axis takes the remaining devices.
    Axis order puts "cam" outermost so gradient psum rides DCN across hosts
    while the latency-sensitive gauss-axis all_gather/sort stays within a
    host's ICI-connected chips (the scaling-book mesh-layout recipe)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % gauss != 0:
        raise ValueError(f"{n} devices not divisible by gauss={gauss}")
    if cam is None:
        cam = n // gauss
    if cam * gauss != n:
        raise ValueError(f"cam*gauss = {cam * gauss} != {n} devices")
    arr = np.asarray(devices).reshape(cam, gauss)
    return Mesh(arr, ("cam", "gauss"))


def runtime_info() -> dict:
    """Process/topology summary for logs and failure triage."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "backend": jax.default_backend(),
        "initialized_distributed": _initialized,
    }
