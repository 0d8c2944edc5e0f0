"""Timing + debug utilities (SURVEY section 5 aux subsystems).

The reference has only ad-hoc wall-clock prints and a CUDA `debug` flag that
dumps rasterizer inputs on exceptions. Here:

  - `loop_bench`: correct TPU timing through the async axon tunnel —
    `block_until_ready` does NOT synchronize there, so K iterations run inside
    one jitted fori_loop and a single scalar is fetched (amortizing the
    ~30-40 ms RPC floor). This is the harness behind bench.py's numbers.
  - `debug_validate`: finiteness + capacity guards for the training loop (the
    moral equivalent of the rasterizer debug snapshot + detect_anomaly).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def loop_bench(fn, *args, iters: int = 8, warmup: bool = True) -> float:
    """Return seconds/iteration of `fn(i, *args) -> scalar` on device.

    `fn` must consume the loop index (to defeat CSE) and reduce its real outputs
    to a scalar (to force full materialization)."""

    @jax.jit
    def run(*a):
        def body(i, acc):
            return acc + fn(i, *a)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    if warmup:
        float(run(*args))  # compile + first execution, host fetch = real sync
    t0 = time.time()
    float(run(*args))
    return (time.time() - t0) / iters


class xla_trace:
    """Capture an XLA profiler trace around a code block.

    Wraps jax.profiler.start_trace/stop_trace: the trace directory receives
    xplane protos viewable in TensorBoard's profile plugin or Perfetto — the
    per-op/per-fusion view behind ROOFLINE.md's stage budget. Usable on CPU and
    TPU backends; no-ops (with a note in `error`) where the backend cannot
    export traces (e.g. some tunnel transports).

        with xla_trace("/tmp/gaustar_trace"):
            run(params, opt_state)  # must FETCH a result to capture device work
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self.error: str | None = None

    def __enter__(self):
        try:
            jax.profiler.start_trace(self.log_dir)
        except Exception as e:  # backend without trace support
            self.error = str(e)
        return self

    def __exit__(self, *exc):
        if self.error is None:
            try:
                jax.profiler.stop_trace()
            except Exception as e:
                self.error = str(e)
        return False


def debug_validate(params, grads=None, aux=None, max_pairs=None, name=""):
    """Host-side sanity checks (call sparsely — each check syncs the device).
    Raises with a descriptive message on non-finite params/grads or rasterizer
    capacity overflow (the silent-truncation case)."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            raise FloatingPointError(f"{name}: non-finite parameter at {jax.tree_util.keystr(path)}")
    if grads is not None:
        for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
            arr = np.asarray(leaf)
            if arr.dtype.kind == "f" and not np.isfinite(arr).all():
                raise FloatingPointError(f"{name}: non-finite gradient at {jax.tree_util.keystr(path)}")
    if aux is not None and max_pairs is not None:
        npairs = int(np.asarray(aux.num_pairs))
        if npairs > max_pairs:
            raise OverflowError(
                f"{name}: rasterizer pair overflow ({npairs} > max_pairs={max_pairs}); "
                "raise RasterConfig.max_pairs — the render was silently truncated"
            )
