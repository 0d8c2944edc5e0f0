"""REFERENCE-SCALE sequence slice through run_sequence (VERDICT r2 item 5).

Two frames at the reference's scale — 100k-face init mesh (600k gaussians),
40 cameras at 1.6 MP, full refine budget — driven END-TO-END by the production
sequence driver (train/sequence.py = train_seq.py:101-249): frame-0 refine,
flow-warp to frame 1, frame-1 refine with mid-refine unbind detection, TSDF
fusion + topology update + half-budget re-refine (frame 1 grows an 8 cm dent),
checkpoint/color-mesh/ply exports. Per-stage walls are recorded by wrapping the
driver's stage entry points and written to REFSCALE_SEQ.json, together with a
device-residency estimate for the full 160-camera ActorsHQ rig.

The dataset is synthesized on disk in the REFERENCE's on-disk contracts
(io/dataset.py: rgb_cameras.npz, images/, depth_humanrf/, masks_humanrf/,
flow_bi/, init_mesh_100k.obj) — analytic ray-sphere depth, green-screen
composited JPEGs, zero bidirectional flow at 0.5x (the dent is new geometry,
not motion).

Run: timeout 7200 python examples/refscale_seq.py
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/gaustar_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from PIL import Image

from gaustar_tpu.io.meshio import write_obj
from gaustar_tpu.mesh.primitives import uv_sphere

W, H = 1600, 1024
N_CAMS = 40
ITERS = int(os.environ.get("REFSEQ_ITERS", "2000"))
CENTER = np.array([0.0, 0.0, 4.0])
RADIUS = 0.6


def _analytic_frame(cam_view, fx, fy, dent: bool):
    """(rgb [H,W,3] u8 pre-composite, alpha u8, depth f32) for one camera."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    view = np.asarray(cam_view, np.float64)
    c_cam = view[:3, :3] @ CENTER + view[:3, 3]
    vx = (xx - W / 2.0) / fx
    vy = (yy - H / 2.0) / fy
    a = vx * vx + vy * vy + 1.0
    b = -2.0 * (vx * c_cam[0] + vy * c_cam[1] + c_cam[2])
    c0 = float(c_cam @ c_cam) - RADIUS * RADIUS
    disc = b * b - 4.0 * a * c0
    hit = disc > 0
    t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / (2.0 * a), 999.0)
    if dent:
        pw = (np.stack([vx * t, vy * t, t], axis=-1) - view[:3, 3]) @ view[:3, :3]
        dmask = hit & (np.linalg.norm(pw - (CENTER + RADIUS * np.array([1.0, 0, 0])), axis=-1) < 0.13)
        t = np.where(dmask, t + 0.08, t)
    else:
        dmask = np.zeros_like(hit)
    rgb = np.zeros((H, W, 3), np.uint8)
    rgb[hit] = 128
    rgb[dmask] = 38
    alpha = (hit * 255).astype(np.uint8)
    depth = np.where(hit, t, 999.0).astype(np.float32)
    return rgb, alpha, depth


def build_dataset(root):
    from gaustar_tpu.utils.synthetic import ring_cameras

    os.makedirs(root, exist_ok=True)
    focal = 1600.0
    cams = ring_cameras(N_CAMS, w=W, h=H, focal=focal)
    intr = np.stack([np.diag([focal, focal, 1.0])] * N_CAMS)
    extr = np.stack([np.asarray(c.view) for c in cams])
    shape = np.stack([[H, W]] * N_CAMS)
    np.savez(os.path.join(root, "rgb_cameras.npz"), intrinsics=intr, extrinsics=extr, shape=shape)

    for fi, dent in ((0, False), (1, True)):
        fdir = os.path.join(root, f"{fi:04d}")
        for sub in ("images", "masks_humanrf", "depth_humanrf", "flow_bi"):
            os.makedirs(os.path.join(fdir, sub), exist_ok=True)
        for ci, cam in enumerate(cams):
            rgb, alpha, depth = _analytic_frame(cam.view, focal, focal, dent)
            Image.fromarray(rgb).save(os.path.join(fdir, "images", f"img_{ci:04d}.jpg"), quality=95)
            Image.fromarray(alpha).save(os.path.join(fdir, "masks_humanrf", f"img_{ci:04d}_alpha.png"))
            np.savez_compressed(
                os.path.join(fdir, "depth_humanrf", f"img_{ci:04d}_depth.npz"), depth=depth
            )
        if fi == 0:  # new geometry, not motion: zero flow at 0.5x
            z = np.zeros((H // 2, W // 2, 2), np.float32)
            for ci in range(N_CAMS):
                np.savez_compressed(os.path.join(fdir, "flow_bi", f"{ci:04d}_f.npz"), flow=z)
                np.savez_compressed(os.path.join(fdir, "flow_bi", f"{ci:04d}_b.npz"), flow=z)

    # 100k-face init mesh (README.md:270): uv sphere at the reference budget.
    verts, faces = uv_sphere(201, 250, radius=RADIUS, center=tuple(CENTER))
    gray = np.full((len(verts), 3), 0.5, np.float32)
    write_obj(os.path.join(root, "init_mesh_100k.obj"), verts, faces, gray)
    return len(faces)


def main():
    from gaustar_tpu.ops.rasterizer import RasterConfig
    from gaustar_tpu.train import mesh_update, refine, topo_detect
    from gaustar_tpu.train.sequence import SequenceConfig, run_sequence
    from gaustar_tpu.tools import warp_mesh

    t0 = time.time()
    root = os.path.join(tempfile.mkdtemp(prefix="gaustar_refseq_"), "data")
    work = root.replace("data", "work")
    n_faces = build_dataset(root)
    report = {
        "n_faces_init": n_faces, "n_cams": N_CAMS, "resolution": [W, H],
        "iterations": ITERS, "frames": 2, "dataset_build_s": round(time.time() - t0, 1),
        "stages": [],
    }
    print(f"dataset built in {report['dataset_build_s']}s at {root}", flush=True)

    # Wall-clock every driver stage (the driver itself is unmodified).
    stages = report["stages"]

    def timed(mod, name):
        orig = getattr(mod, name)

        def wrap(*a, **k):
            t0 = time.time()
            out = orig(*a, **k)
            stages.append({"stage": name, "wall_s": round(time.time() - t0, 1)})
            print(f"[stage] {name}: {stages[-1]['wall_s']}s", flush=True)
            return out

        setattr(mod, name, wrap)

    timed(refine, "refine_frame")
    timed(mesh_update, "extract_mesh_fusion")
    timed(mesh_update, "update_mesh_with_fusion")
    timed(topo_detect, "detect_topo_err")
    timed(warp_mesh, "warp_mesh_using_flow")

    seq = SequenceConfig(
        data_root=root, work_root=work, frame_0=0, frame_end=2,
        refinement_iterations=ITERS, sh_reg=True,
        force_watertight=False,
        fusion_simplify_face_num=150_000,
        auto_size_caps=1.3,
    )
    rcfg = RasterConfig(max_pairs=1_536_000, max_padded=1_600_000, chunk=256, impl="pallas")

    t0 = time.time()
    run_sequence(seq, raster_cfg=rcfg)
    report["sequence_wall_s"] = round(time.time() - t0, 1)

    for fi in range(2):
        fdir = os.path.join(work, f"{fi:04d}")
        report[f"frame{fi}_updated"] = os.path.exists(os.path.join(fdir, "updated_mesh.obj"))
        report[f"frame{fi}_ckpt"] = os.path.exists(os.path.join(fdir, f"{ITERS}.npz"))

    # Device-residency headroom for the full 160-camera ActorsHQ rig
    # (cameras.py:20): GT images+depths resident like FrameData pins them.
    gt_bytes_40 = N_CAMS * W * H * (3 + 1) * 4
    gt_bytes_160 = 160 * W * H * (3 + 1) * 4
    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        mem = {k: int(v) for k, v in stats.items() if "bytes" in k}
    except Exception:
        pass
    report["gt_resident_gb_40cams"] = round(gt_bytes_40 / 2**30, 2)
    report["gt_resident_gb_160cams"] = round(gt_bytes_160 / 2**30, 2)
    report["hbm"] = mem or {"unavailable": "memory_stats() empty"}
    report["note_160cams"] = (
        "160 cams x 1.6 MP GT = ~2.4 GB resident (f32 RGB+depth) — fits v5e's"
        " 16 GB HBM beside the ~1.5 GB step working set; at 4K-class frames,"
        " shard GT over the camera-DP axis (each device pins C/D cameras,"
        " parallel/sharding.py) or stream per-camera GT host->device per step."
    )
    report["backend"] = jax.default_backend()

    with open("REFSCALE_SEQ.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "stages"}))


if __name__ == "__main__":
    main()
