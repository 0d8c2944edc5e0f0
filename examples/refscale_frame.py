"""One REFERENCE-SCALE frame on the real chip (VERDICT r1, item 10).

Reference config-2 scale (train_seq.py:45-46, README.md:270, cameras.py:20):
100k-face mesh -> 600k mesh-bound gaussians, 40 cameras at 1.6 MP, the full
2000-iteration refine loop (RGB+depth passes, SSIM + mesh losses, SH warmup,
Adam with the exp position schedule) plus the one-time topology detection at
iters/2 (refine.py:720-737) over all 40 cameras. Records wall time, the
per-iteration step time, detection time, and HBM stats to REFSCALE.json.

Iterations run in 4 on-device segments (one lax.fori_loop per SH-warmup
degree) because per-iteration host dispatch over the axon tunnel would pay a
~40 ms RPC floor each step and distort the wall time; host work happens only
where the reference also leaves the device (detection).

Run: timeout 3000 python examples/refscale_frame.py
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

from bench import H, W, build_scene
from gaustar_tpu.mesh.topology import build_topology
from gaustar_tpu.models import sugar
from gaustar_tpu.train.optimizer import OptimizationParams, make_sugar_optimizer
from gaustar_tpu.train.refine import RefineConfig, compute_losses
from gaustar_tpu.train.topo_detect import TopoDetectConfig, detect_topo_err

ITERS = 2000
N_CAMS = 40


def main():
    t_start = time.time()
    params, config, data, raster_cfg = build_scene()

    # Widen the bench's 4-camera rig to the reference's 40 (GT content is
    # synthetic; cost depends only on resolution/counts).
    from gaustar_tpu.cameras import stack_cameras
    from gaustar_tpu.utils.synthetic import ring_cameras

    cams = stack_cameras(ring_cameras(N_CAMS, w=W, h=H, focal=1600.0))
    rep = lambda a: jnp.broadcast_to(a[:1], (N_CAMS,) + a.shape[1:])
    data = data._replace(
        cameras=cams,
        gt_images=rep(data.gt_images),
        gt_depths=rep(data.gt_depths),
        margins=jnp.broadcast_to(data.margins[:1], (N_CAMS, 4)),
    )

    cfg = RefineConfig(num_iterations=ITERS, loose_bind_from=ITERS // 2, do_sh_warmup=True)
    n_faces = config.faces.shape[0]
    pts = np.asarray(params.points)
    radius = float(np.linalg.norm(pts.max(0) - pts.min(0)) / 2.0)
    spatial_lr_scale = 10.0 * radius / np.sqrt(n_faces)
    optimizer = make_sugar_optimizer(OptimizationParams(iterations=ITERS), spatial_lr_scale)
    opt_state = optimizer.init(params)

    n_g = params.scales.shape[0]
    uw = jnp.zeros((n_g,), jnp.float32)
    pre = params.sh_dc[:, 0, :] * 0.0

    def make_segment(sh_deg):
        # `data` rides as a jit ARGUMENT: closing over 40 cameras of GT (~1 GB)
        # embeds it in the compile payload and overflows the remote compiler's
        # request limit (HTTP 413 over the axon tunnel).
        @jax.jit
        def run(params, opt_state, data, it0, n_steps, cam_idxs):
            def body(k, carry):
                p, o, acc = carry
                it = it0 + k

                def loss_fn(pp):
                    return compute_losses(
                        pp, config, data, cam_idxs[k], it, cfg, raster_cfg,
                        sh_deg, uw, pre,
                    )

                (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
                import optax

                updates, o = optimizer.update(grads, o, p)
                p = optax.apply_updates(p, updates)
                return (p, o, acc + loss)

            return lax.fori_loop(0, n_steps, body, (params, opt_state, jnp.float32(0.0)))

        return run

    rng = np.random.default_rng(0)
    seg_len = ITERS // 4
    seg_cache = {}

    def segment(sh_deg):
        if sh_deg not in seg_cache:
            seg_cache[sh_deg] = make_segment(sh_deg)
        return seg_cache[sh_deg]
    report = {"n_gaussians": int(n_g), "n_faces": int(n_faces), "n_cams": N_CAMS,
              "resolution": [W, H], "iterations": ITERS, "segments": []}

    setup_s = time.time() - t_start
    detect_s = None
    total_step_s = 0.0
    t_frame = time.time()
    for q in range(4):
        sh_deg = min(q + 1, 3) - 1  # sh_deg_at: +1 level per iters/4
        it0 = q * seg_len + 1

        # Sub-chunks of <= 50 iters per device call: one 500-iter execution is
        # ~90 s on-device, which trips the tunnel's worker watchdog (observed
        # "TPU worker process crashed"); 50-iter calls amortize dispatch fine.
        t0 = time.time()
        acc = 0.0
        inner = 50
        run = segment(sh_deg)
        first_nan = None
        for s0 in range(0, seg_len, inner):
            cam_idxs = jnp.asarray(rng.integers(0, N_CAMS, size=inner), jnp.int32)
            params, opt_state, a = run(
                params, opt_state, data, jnp.int32(it0 + s0), inner, cam_idxs
            )
            a = float(a)  # host fetch = sync (axon: block_until_ready no-op)
            if first_nan is None and not np.isfinite(a):
                first_nan = it0 + s0
                print(f"  NaN/inf loss first seen in chunk starting it {first_nan}",
                      flush=True)
            acc += a
        dt = time.time() - t0
        total_step_s += dt
        report["segments"].append(
            {"sh_deg": sh_deg, "iters": seg_len, "wall_s": round(dt, 2),
             "ms_per_iter": round(dt / seg_len * 1e3, 2), "loss_sum": acc,
             "first_nonfinite_chunk_it": first_nan}
        )
        print(f"segment {q}: sh_deg {sh_deg}, {seg_len} iters, {dt:.1f}s "
              f"({dt/seg_len*1e3:.1f} ms/iter), loss_sum {acc:.3f}", flush=True)

        if q == 1:  # detection at iters/2, like the sequence driver
            topo = build_topology(np.asarray(config.faces), params.points.shape[0])
            t0 = time.time()
            fw = detect_topo_err(
                params, config, data.cameras, np.asarray(data.gt_depths), topo,
                raster_cfg, TopoDetectConfig(),
            )
            detect_s = time.time() - t0
            print(f"detection over {N_CAMS} cams: {detect_s:.1f}s, "
                  f"flagged faces {(fw >= 0.6).sum()}", flush=True)

    frame_s = time.time() - t_frame

    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        mem = {k: int(v) for k, v in stats.items() if "bytes" in k} or {
            "unavailable": "memory_stats() empty"
        }
    except Exception as e:  # axon may not expose memory stats
        mem = {"unavailable": str(e)}

    # steady-state = last segment (full SH degree, warmed caches)
    steady = report["segments"][-1]["ms_per_iter"]
    report.update(
        {
            "setup_s": round(setup_s, 1),
            "frame_wall_s": round(frame_s, 1),
            "train_wall_s": round(total_step_s, 1),
            "detect_topo_s": round(detect_s, 1) if detect_s else None,
            "steady_ms_per_iter": steady,
            "steady_mpix_s": round(W * H / (steady / 1e3) / 1e6, 2),
            "hbm": mem,
            "backend": jax.default_backend(),
        }
    )
    with open("REFSCALE.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "segments"}))


if __name__ == "__main__":
    main()
