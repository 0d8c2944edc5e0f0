"""One REFERENCE-SCALE frame on the real chip, END TO END (VERDICT r2 items 1-2).

Reference config-2 scale (train_seq.py:45-46, README.md:270, cameras.py:20):
100k-face mesh -> 600k mesh-bound gaussians, 40 cameras at 1.6 MP, the full
2000-iteration refine loop (RGB+depth passes, SSIM + mesh losses, SH warmup,
Adam with the exp position schedule), topology detection at iters/2
(refine.py:720-737) over all 40 cameras, then the FULL mesh-update cycle the
sequence driver runs when a change is detected (train_seq.py:150-213):
extract_mesh_fusion (72 orbit + 40 rig renders into the TSDF,
refined_mesh.py:311-459), update_mesh_topo over 5 aabb pads
(refined_mesh.py:1034-1052), and the half-budget re-refine on the updated mesh.
Per-stage walls go to REFSCALE.json.

Compile accounting (round-2 segment-variance root cause): the r2 harness jitted
one program per SH-warmup degree and timed compile INSIDE the segment walls —
segments at the same sh_deg measured 498 vs 188 ms/iter purely because three of
four segments paid ~160 s of XLA compile over the axon tunnel. This version
(a) uses the TRACED SH warmup (ops/sh.py eval_sh_soa_banded: identical values
and gradients), so the whole frame is ONE program, and (b) AOT-compiles it
(jit.lower().compile()) with the compile wall reported separately. Segment
ms/iter is now pure step time and must be flat.

The GT carries a deliberate geometry change (a 20 cm "dent" disc in the depth
maps) so detection flags a region and the update cycle does real surgery.

Run: timeout 5400 python examples/refscale_frame.py
"""

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
from gaustar_tpu.ops import sh as sh_ops
from gaustar_tpu.ops.losses import edge_lengths, face_areas_normals
from gaustar_tpu.train import mesh_update
from gaustar_tpu.train.optimizer import OptimizationParams, make_sugar_optimizer
from gaustar_tpu.train.refine import FrameData, RefineConfig, compute_losses, compute_margins
from gaustar_tpu.train.topo_detect import TopoDetectConfig, detect_topo_err

import os

# Env overrides turn this into the 160-camera GT-residency probe (VERDICT r2
# missing #4: the reference rig is 160 cams, cameras.py:20 — 160 x 1.6 MP GT
# is ~4.2 GB of device-resident arrays before render buffers):
#   GAUSTAR_REFSCALE_CAMS=160 GAUSTAR_REFSCALE_ITERS=200 \
#   GAUSTAR_REFSCALE_OUT=REFSCALE160.json python examples/refscale_frame.py
ITERS = int(os.environ.get("GAUSTAR_REFSCALE_ITERS", "2000"))
BATCH = int(os.environ.get("GAUSTAR_REFSCALE_BATCH", "1"))
N_CAMS = int(os.environ.get("GAUSTAR_REFSCALE_CAMS", "40"))
OUT_JSON = os.environ.get("GAUSTAR_REFSCALE_OUT", "REFSCALE.json")
INNER = 50  # iterations per device call (tunnel watchdog bound, see r2 notes)


def widen_rig(data):
    """Widen the bench's 4-camera rig to the reference's 40 with GEOMETRICALLY
    CONSISTENT GT: analytic ray-sphere depth per camera (the bench's flat-slab
    depth disagrees with the sphere by up to 60 cm, which flags most of the
    surface and makes surgery graft a million-face patch — round-3 run 1).
    A deliberate 8 cm dent disc per view is the only inconsistency, so the
    detector flags a LOCAL region like the reference's cloth-pickup scenario."""
    from gaustar_tpu.cameras import index_camera, stack_cameras
    from gaustar_tpu.utils.synthetic import ring_cameras

    center = np.array([0.0, 0.0, 4.0])
    radius = 0.6
    cams = stack_cameras(ring_cameras(N_CAMS, w=W, h=H, focal=1600.0))
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    gt_imgs, gt_depths = [], []
    for ci in range(N_CAMS):
        cam = index_camera(cams, ci)
        view = np.asarray(cam.view, np.float64)
        c_cam = view[:3, :3] @ center + view[:3, 3]
        fx, fy = float(np.asarray(cam.fx)), float(np.asarray(cam.fy))
        vx = (xx - W / 2.0) / fx
        vy = (yy - H / 2.0) / fy
        # ray p(t) = t * (vx, vy, 1); |p - c_cam|^2 = r^2; depth = view z = t.
        a = vx * vx + vy * vy + 1.0
        b = -2.0 * (vx * c_cam[0] + vy * c_cam[1] + c_cam[2])
        c0 = float(c_cam @ c_cam) - radius * radius
        disc = b * b - 4.0 * a * c0
        hit = disc > 0
        t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / (2.0 * a), 10.5)
        # World-space dent: an 8 cm-deep depression inside a 13 cm ball on the
        # sphere surface — the SAME 3D change in every view (multi-view
        # consistent, like the reference's cloth-pickup scenario).
        pw = (np.stack([vx * t, vy * t, t], axis=-1) - view[:3, 3]) @ view[:3, :3]
        dent_center = center + radius * np.array([1.0, 0.0, 0.0])
        dent = hit & (np.linalg.norm(pw - dent_center, axis=-1) < 0.13)
        depth = np.where(dent, t + 0.08, t).astype(np.float32)
        img = np.where(hit[..., None], np.float32(0.5),
                       np.array([0.0, 1.0, 0.0], np.float32))
        img = np.where(dent[..., None], np.float32(0.15), img)
        gt_imgs.append(img.astype(np.float32))
        gt_depths.append(depth)
    return data._replace(
        cameras=cams,
        gt_images=jnp.asarray(np.stack(gt_imgs)),
        gt_depths=jnp.asarray(np.stack(gt_depths)),
        margins=jnp.broadcast_to(data.margins[:1], (N_CAMS, 4)),
    )


def make_runner(config, raster_cfg, cfg, optimizer, n_g, iters_total):
    """One jitted INNER-iteration fori runner for the WHOLE frame: SH warmup is
    traced (banded eval), so there is exactly one XLA program. With BATCH > 1
    (GAUSTAR_REFSCALE_BATCH) each iteration averages a camera batch via the
    scan-batched step (compute_losses_multi_scan — flat compile in B)."""
    uw = jnp.zeros((n_g,), jnp.float32)

    @jax.jit
    def run(params, opt_state, data, it0, cam_idxs, pre):
        def body(k, carry):
            p, o, acc = carry
            it = it0 + k
            every = max(iters_total // 4, 1)
            cur_deg = jnp.minimum(it // every + 1, 3) - 1
            band_w = sh_ops.warmup_degree_weights(cur_deg, 3)

            def loss_fn(pp):
                if BATCH > 1:
                    from gaustar_tpu.train.refine import compute_losses_multi_scan

                    return compute_losses_multi_scan(
                        pp, config, data, cam_idxs[k], it, cfg, raster_cfg,
                        2, uw, pre, band_w,
                    )
                return compute_losses(
                    pp, config, data, cam_idxs[k], it, cfg, raster_cfg,
                    2, uw, pre, band_w,
                )

            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            import optax

            updates, o = optimizer.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o, acc + loss)

        return lax.fori_loop(0, INNER, body, (params, opt_state, jnp.float32(0.0)))

    return run


def train_frame(params, config, data, raster_cfg, cfg, iters, rng, report_key, report,
                post_compile_hook=None):
    """AOT-compile the runner (compile wall reported separately), then run
    `iters` iterations in INNER-sized device calls, timing 4 segments.
    `post_compile_hook` (if given) runs right after the AOT compile, before the
    first segment — the refscale harness uses it to launch the background
    detection/fusion program prewarm threads so THEIR compiles overlap the
    training wall (compile-vs-execution overlap measured in
    /tmp probe: execution dispatch latency grows ~40 ms during a host-side
    compile — negligible against the ~5 s INNER-chunk device calls)."""
    n_g = params.scales.shape[0]
    n_faces = config.faces.shape[0]
    pts = np.asarray(params.points)
    radius = float(np.linalg.norm(pts.max(0) - pts.min(0)) / 2.0)
    spatial_lr_scale = 10.0 * radius / np.sqrt(n_faces)
    optimizer = make_sugar_optimizer(OptimizationParams(iterations=iters), spatial_lr_scale)
    opt_state = optimizer.init(params)
    pre = params.sh_dc[:, 0, :] * 0.0

    run = make_runner(config, raster_cfg, cfg, optimizer, n_g, iters)
    cam_shape = (INNER, BATCH) if BATCH > 1 else (INNER,)
    cam_idxs0 = jnp.asarray(rng.integers(0, N_CAMS, size=cam_shape), jnp.int32)

    t0 = time.time()
    compiled = run.lower(
        params, opt_state, data, jnp.int32(1), cam_idxs0, pre
    ).compile()
    compile_s = time.time() - t0
    print(f"[{report_key}] compile: {compile_s:.1f}s (one program, traced SH warmup)",
          flush=True)
    if post_compile_hook is not None:
        post_compile_hook()

    seg_len = max(iters // 4, 1)
    segments = []
    total = 0.0
    for q in range(4):
        it0 = q * seg_len + 1
        t0 = time.time()
        acc, first_nan = 0.0, None
        for s0 in range(0, seg_len, INNER):
            cam_idxs = jnp.asarray(rng.integers(0, N_CAMS, size=cam_shape), jnp.int32)
            params, opt_state, a = compiled(
                params, opt_state, data, jnp.int32(it0 + s0), cam_idxs, pre
            )
            a = float(a)  # host fetch = sync
            if first_nan is None and not np.isfinite(a):
                first_nan = it0 + s0
                print(f"  NaN/inf loss first seen in chunk starting it {first_nan}", flush=True)
            acc += a
        dt = time.time() - t0
        total += dt
        segments.append(
            {"iters": seg_len, "wall_s": round(dt, 2),
             "ms_per_iter": round(dt / seg_len * 1e3, 2), "loss_sum": acc,
             "first_nonfinite_chunk_it": first_nan}
        )
        print(f"[{report_key}] segment {q}: {seg_len} iters, {dt:.1f}s "
              f"({dt/seg_len*1e3:.1f} ms/iter), loss_sum {acc:.3f}", flush=True)

    ms = [s["ms_per_iter"] for s in segments]
    report[report_key] = {
        "compile_s": round(compile_s, 1),
        "segments": segments,
        "train_wall_s": round(total, 1),
        "ms_per_iter_mean": round(float(np.mean(ms)), 2),
        "ms_per_iter_spread_pct": round(
            100.0 * (max(ms) - min(ms)) / max(np.mean(ms), 1e-9), 1
        ),
    }
    return params, opt_state


def main():
    t_start = time.time()
    params, config, data, raster_cfg = build_scene()
    data = widen_rig(data)
    # Demand-probed capacities over the full 40-cam rig (ops/rasterizer.py) —
    # the production sizing policy (train/refine.py auto_size_caps).
    from gaustar_tpu.models import sugar as _sugar
    from gaustar_tpu.ops.rasterizer import probe_pair_demand, size_caps_to_demand

    d_p, d_pad, d_act = probe_pair_demand(
        _sugar.gaussian_centers(params, config), _sugar.cov3d(params, config),
        _sugar.strengths(params), data.cameras, raster_cfg,
    )
    raster_cfg = size_caps_to_demand(raster_cfg, d_p, d_pad, 1.3, demand_active=d_act)
    print(f"autocaps: pairs={raster_cfg.max_pairs} padded={raster_cfg.max_padded} "
          f"active={raster_cfg.max_active_tiles}", flush=True)
    report = {
        "n_gaussians": int(params.scales.shape[0]),
        "n_faces": int(config.faces.shape[0]),
        "n_cams": N_CAMS, "resolution": [W, H], "iterations": ITERS,
        "camera_batch": BATCH,  # B>1: each iteration averages a camera batch
    }
    cfg = RefineConfig(num_iterations=ITERS, loose_bind_from=ITERS // 2, do_sh_warmup=True)
    rng = np.random.default_rng(0)
    report["setup_s"] = round(time.time() - t_start, 1)

    # Background prewarm of the detection + fusion device programs (launched
    # right after the refine AOT compile, overlapped with the training wall):
    # both are ~170 s tunnel compiles that round-4 runs paid SERIALLY after
    # training (detect_compile_s 170.1 + ~170 inside fusion_s 182.4). The
    # prewarm threads compile the exact programs the later calls dispatch
    # (jax AOT/dispatch cache sharing; shape stability via 16-voxel dim
    # buckets in tsdf.fit_volume_to_points).
    import threading

    from gaustar_tpu.train import topo_detect as _td
    from gaustar_tpu.train import mesh_update as _mu

    prewarm_errs = []

    def _prewarm(fn, *a, **kw):
        try:
            fn(*a, **kw)
        except Exception as e:  # noqa: BLE001 — prewarm is best-effort
            prewarm_errs.append(repr(e))

    threads = [
        threading.Thread(
            target=_prewarm, daemon=True,
            args=(_td.prewarm_detect, params, config, data.cameras,
                  tuple(np.asarray(data.gt_depths).shape), raster_cfg,
                  TopoDetectConfig()),
        ),
        threading.Thread(
            target=_prewarm, daemon=True,
            args=(_mu.prewarm_fusion, params, config, data.cameras, raster_cfg),
            kwargs=dict(voxel_size=0.008, sdf_trunc=0.02, max_dim=512),
        ),
    ]

    def start_prewarm():
        for t in threads:
            t.start()

    t_frame = time.time()
    params, _ = train_frame(
        params, config, data, raster_cfg, cfg, ITERS, rng, "refine", report,
        post_compile_hook=start_prewarm,
    )
    t0 = time.time()
    for t in threads:
        t.join()
    prewarm_residual_s = time.time() - t0
    report["prewarm_residual_s"] = round(prewarm_residual_s, 1)
    if prewarm_errs:
        report["prewarm_errors"] = prewarm_errs
    print(f"prewarm residual wait after training: {prewarm_residual_s:.1f}s "
          f"(errors: {prewarm_errs or 'none'})", flush=True)

    # --- detection over all 40 cams (the sequence driver runs this mid-refine
    # AND again before the update; we time the post-training pass). A 1-camera
    # warmup isolates the one-time jit compile of the detection body. ---
    topo = build_topology(np.asarray(config.faces), params.points.shape[0])
    # First call pays the one-time XLA compile of the 40-camera scan program
    # (a 1-camera warmup would compile a DIFFERENT program — scan length is
    # static); the second call is the pure execution wall.
    t0 = time.time()
    detect_topo_err(
        params, config, data.cameras, np.asarray(data.gt_depths), topo,
        raster_cfg, TopoDetectConfig(),
    )
    detect_first_s = time.time() - t0
    t0 = time.time()
    face_w = detect_topo_err(
        params, config, data.cameras, np.asarray(data.gt_depths), topo,
        raster_cfg, TopoDetectConfig(),
    )
    detect_s = time.time() - t0
    detect_compile_s = max(detect_first_s - detect_s, 0.0)
    n_flagged = int((face_w >= 0.6).sum())
    report["detect_compile_s"] = round(detect_compile_s, 1)
    report["detect_topo_s"] = round(detect_s, 1)
    report["detect_flagged_faces"] = n_flagged
    print(f"detection over {N_CAMS} cams: {detect_s:.1f}s "
          f"(+{detect_compile_s:.1f}s one-time compile), flagged faces {n_flagged}",
          flush=True)

    # --- mesh-update cycle (train_seq.py:150-213) ---
    update_ok = False
    try:
        t0 = time.time()
        # simplify_face_num mirrors the reference's quadric decimation of the
        # fused mesh (refined_mesh.py:458); marching tetrahedra at 8 mm voxels
        # would otherwise graft ~1.4M-face patches (round-3 run 1).
        fusion = mesh_update.extract_mesh_fusion(
            params, config, data.cameras, raster_cfg,
            voxel_size=0.008, sdf_trunc=0.02, max_dim=512,
            simplify_face_num=150_000,
        )
        fusion_s = time.time() - t0
        report["fusion_s"] = round(fusion_s, 1)
        report["fusion_faces"] = int(len(fusion.faces))
        print(f"extract_mesh_fusion (72 orbit + {N_CAMS} rig views): {fusion_s:.1f}s, "
              f"{len(fusion.faces)} fused faces", flush=True)

        t0 = time.time()
        out = mesh_update.update_mesh_with_fusion(
            params, config, fusion, face_w, force_watertight=False,
        )
        update_s = time.time() - t0
        report["update_s"] = round(update_s, 1)
        report["cc_update_num"] = int(out.get("cc_update_num", 0))
        print(f"update_mesh_topo x5 pads: {update_s:.1f}s, "
              f"cc_update_num {out.get('cc_update_num', 0)}", flush=True)
        update_ok = out.get("cc_update_num", 0) > 0
    except Exception as e:  # noqa: BLE001 — record partial results either way
        report["update_error"] = repr(e)
        print(f"mesh update failed: {e!r}", flush=True)

    if update_ok:
        um = out["updated_mesh"]
        report["updated_faces"] = int(len(um.faces))
        # Re-refine on the updated mesh: half budget, unbind off, edge-iso off
        # (train_seq.py:187-213). New face count -> new program (compile timed).
        from gaustar_tpu.train.sequence import _face_colors_to_vertex

        vc = _face_colors_to_vertex(um)
        verts2 = um.verts.astype(np.float32)
        faces2 = um.faces.astype(np.int32)
        topo2 = build_topology(faces2, len(verts2))
        el2 = np.asarray(edge_lengths(jnp.asarray(verts2), jnp.asarray(topo2.edges)))
        area2 = np.asarray(out["new_ref_area"], np.float32)
        params2, config2 = sugar.init_sugar(
            verts2, faces2, vertex_colors=vc,
            min_scale=float(el2.mean()) * 0.1, max_scale=float(el2.mean()) * 5.0,
        )
        margins = compute_margins(
            np.asarray(data.cameras.cx), np.asarray(data.cameras.cy), W, H
        )
        data2 = FrameData(
            cameras=data.cameras, gt_images=data.gt_images, gt_depths=data.gt_depths,
            margins=jnp.asarray(margins), ref_edge_len=jnp.asarray(el2),
            ref_area=jnp.asarray(area2), edges=jnp.asarray(topo2.edges),
            adj_faces=jnp.asarray(topo2.adj_faces),
        )
        cfg2 = RefineConfig(
            num_iterations=ITERS // 2, edge_iso_from=999_999,
            loose_bind_from=10**9, do_sh_warmup=True,
        )
        params2, _ = train_frame(
            params2, config2, data2, raster_cfg, cfg2, ITERS // 2, rng,
            "re_refine", report,
        )

    frame_s = time.time() - t_frame
    report["frame_wall_s"] = round(frame_s, 1)

    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        mem = {k: int(v) for k, v in stats.items() if "bytes" in k} or {
            "unavailable": "memory_stats() empty"
        }
    except Exception as e:  # axon may not expose memory stats
        mem = {"unavailable": str(e)}
    report["hbm"] = mem
    report["backend"] = jax.default_backend()

    steady = report["refine"]["segments"][-1]["ms_per_iter"]
    report["steady_ms_per_iter"] = steady
    report["steady_mpix_s"] = round(W * H / (steady / 1e3) / 1e6, 2)

    with open(OUT_JSON, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items()
                      if k not in ("refine", "re_refine", "hbm")}))


if __name__ == "__main__":
    main()
