"""Op-level xplane trace of the full refine step (the tool behind ROOFLINE.md's
per-op tables). Captures K steps under jax.profiler, parses the xplane proto
(tensorflow's schema), and aggregates device-plane event durations by op name.

Run on the chip:  python examples/profile_trace.py [steps]
Writes the raw trace under /tmp/gaustar_trace_r4 (TensorBoard-compatible) and
prints the top ops by total self time.
"""

import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import build_scene
from gaustar_tpu.train.optimizer import OptimizationParams, make_sugar_optimizer
from gaustar_tpu.train.refine import RefineConfig, compute_losses

TRACE_DIR = "/tmp/gaustar_trace_r4"
K = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def main():
    import optax

    params, config, data, raster_cfg = build_scene()
    if os.environ.get("GAUSTAR_TRACE_AUTOCAPS", "1") != "0":
        # Match bench.py's production sizing (probed caps + tile compaction).
        from gaustar_tpu.models import sugar as _sugar
        from gaustar_tpu.ops.rasterizer import probe_pair_demand, size_caps_to_demand

        d_p, d_pad, d_act = probe_pair_demand(
            _sugar.gaussian_centers(params, config), _sugar.cov3d(params, config),
            _sugar.strengths(params), data.cameras, raster_cfg,
        )
        raster_cfg = size_caps_to_demand(raster_cfg, d_p, d_pad, demand_active=d_act)
    cfg = RefineConfig(num_iterations=2000, loose_bind_from=10**9, do_sh_warmup=False)
    optimizer = make_sugar_optimizer(OptimizationParams(), 1.0)
    opt_state = optimizer.init(params)
    n_g = params.scales.shape[0]
    uw = jnp.zeros((n_g,), jnp.float32)
    pre = params.sh_dc[:, 0, :] * 0.0

    @jax.jit
    def step(params, opt_state, it):
        def loss_fn(p):
            return compute_losses(
                p, config, data, jnp.mod(it, 4), it, cfg, raster_cfg, 2, uw, pre
            )

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # Warm up (compile outside the trace).
    params, opt_state, loss = step(params, opt_state, jnp.int32(0))
    print(f"warmup loss={float(loss):.4f}", flush=True)

    jax.profiler.start_trace(TRACE_DIR)
    for i in range(1, K + 1):
        params, opt_state, loss = step(params, opt_state, jnp.int32(i))
    _ = float(loss)  # host fetch = sync under the axon tunnel
    jax.profiler.stop_trace()

    aggregate()


def aggregate():
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane files under {TRACE_DIR}"
    path = max(paths, key=os.path.getmtime)
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    per_op = defaultdict(float)
    counts = defaultdict(int)
    for plane in xspace.planes:
        if "TPU" not in plane.name:
            continue
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            # The sync compute line only: "Async XLA Ops" (DMA copy/slice-start
            # spans) OVERLAP compute — counting them double-books the step.
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                per_op[name] += ev.duration_ps / 1e9  # ms
                counts[name] += 1
    total = sum(per_op.values())
    print(f"\nXLA Ops total over {K} steps: {total:.1f} ms — per step {total / K:.1f}")
    print(f"{'op':<72} {'ms/step':>9} {'n/step':>7}")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{name[:72]:<72} {ms / K:9.3f} {counts[name] / K:7.1f}")


if __name__ == "__main__":
    main()
