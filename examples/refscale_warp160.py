"""Flow-warp at the FULL ActorsHQ rig scale: 100k verts x 160 cameras x 1.6 MP
(VERDICT r2 item 4: "flow-warp has never been timed at 100k verts x 160 cams";
the 40-camera figure is in REFSCALE_SEQ.json). Host-side numpy like the
reference's warp (warp_mesh.py:216-402 is all CPU there too). Synthetic
analytic sphere GT; flows carry a rigid +2 cm x-translation so the warp output
is verifiable against the known motion. Writes WARP160.json.

Run: timeout 3600 python examples/refscale_warp160.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

W, H = 1600, 1024
FOCAL = 2000.0  # ~1.25 mm/px at 2.5 m: the ActorsHQ rig's footprint scale
DIST = 2.5
N_CAMS = 160
CENTER = np.array([0.0, 0.0, 4.0])
RADIUS = 0.6
SHIFT = np.array([0.02, 0.0, 0.0])  # frame t -> t+1 rigid motion


def sphere_depth(cam_view, fx, fy, center):
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    view = np.asarray(cam_view, np.float64)
    c_cam = view[:3, :3] @ center + view[:3, 3]
    vx = (xx - W / 2.0) / fx
    vy = (yy - H / 2.0) / fy
    a = vx * vx + vy * vy + 1.0
    b = -2.0 * (vx * c_cam[0] + vy * c_cam[1] + c_cam[2])
    c0 = float(c_cam @ c_cam) - RADIUS * RADIUS
    disc = b * b - 4.0 * a * c0
    hit = disc > 0
    t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / (2.0 * a), 999.0)
    return t.astype(np.float32), hit, (vx, vy)


def main():
    from gaustar_tpu.mesh.primitives import uv_sphere
    from gaustar_tpu.tools import warp_mesh
    from gaustar_tpu.utils.synthetic import rig_cameras

    t0 = time.time()
    # Multi-elevation rig like ActorsHQ (cameras at many heights): with a single
    # equatorial ring the reference's harsh depth-edge gate (edge_scalar 1e4 on a
    # variance map) leaves polar vertices unobserved by >= 4 cameras.
    cams = rig_cameras(N_CAMS, rows=5, dist=DIST, w=W, h=H, focal=FOCAL)
    intr = np.stack([np.diag([FOCAL, FOCAL, 1.0])] * N_CAMS)
    extr = np.stack([np.asarray(c.view) for c in cams])
    cmr = {
        "intrinsics": intr,
        "extrinsics": extr,
        "shape": np.stack([[H, W]] * N_CAMS),
    }
    verts, faces = uv_sphere(201, 250, radius=RADIUS, center=tuple(CENTER))

    flows_f, flows_b, depths_t, depths_t1 = [], [], [], []
    for cam in cams:
        d0, hit, (vx, vy) = sphere_depth(cam.view, FOCAL, FOCAL, CENTER)
        d1, _, _ = sphere_depth(cam.view, FOCAL, FOCAL, CENTER + SHIFT)
        # Exact flow of the visible surface: project p and p+SHIFT.
        view = np.asarray(cam.view, np.float64)
        s_cam = view[:3, :3] @ SHIFT  # camera-space motion
        z1 = d0 + s_cam[2]
        fx1 = (vx * d0 + s_cam[0]) / np.maximum(z1, 1e-6) * FOCAL
        fy1 = (vy * d0 + s_cam[1]) / np.maximum(z1, 1e-6) * FOCAL
        # Repo convention (tools/geometry.py): pixels and flows are (row, col).
        fw = np.stack([fy1 - vy * FOCAL, fx1 - vx * FOCAL], axis=-1)
        fw = np.where(hit[..., None], fw, 0.0).astype(np.float32)
        # Real data path: RAFT emits 0.5x flows; the loader resizes them back to
        # full resolution (io/dataset.py:121 -> geometry.pad_and_resize_flow)
        # BEFORE they reach warp_mesh_using_flow, which takes full-res flows.
        from gaustar_tpu.tools.geometry import pad_and_resize_flow
        flows_f.append(pad_and_resize_flow(fw[::2, ::2] * 0.5, None, (H, W)))
        flows_b.append(pad_and_resize_flow(-fw[::2, ::2] * 0.5, None, (H, W)))
        depths_t.append(d0)
        depths_t1.append(d1)
    build_s = time.time() - t0

    # edge_scalar: the reference normalizes the depth-edge (variance) map by its
    # PER-IMAGE MAX before thresholding (warp_mesh.py:298). A sphere's entire
    # silhouette sits at the max foreground depth, so the silhouette step — the
    # normalizer — is ~12x smaller than a real capture's (where near limbs meet
    # far background); scaling edge_scalar 10000 -> 1000 restores the same
    # effective ~1.6 mm window-std rejection level a real ActorsHQ frame gets.
    import dataclasses
    cfg = dataclasses.replace(warp_mesh.WarpConfig(), edge_scalar=1000.0)
    t0 = time.time()
    warped, _move, observed = warp_mesh.warp_mesh_using_flow(
        verts.astype(np.float64), faces, cmr, flows_f, flows_b,
        depths_t, depths_t1, cfg,
    )
    warp_s = time.time() - t0

    err = np.linalg.norm((warped - verts) - SHIFT, axis=1)
    report = {
        "n_verts": int(len(verts)),
        "n_faces": int(len(faces)),
        "n_cams": N_CAMS,
        "resolution": [W, H],
        "gt_build_s": round(build_s, 1),
        "warp_s": round(warp_s, 1),
        "warp_s_per_cam": round(warp_s / N_CAMS, 2),
        "observed_vert_pct": round(100.0 * float(np.mean(observed)), 1),
        "motion_err_mean_mm": round(float(err.mean()) * 1000.0, 2),
        "motion_err_p95_mm": round(float(np.quantile(err, 0.95)) * 1000.0, 2),
        "true_motion_mm": float(np.linalg.norm(SHIFT) * 1000.0),
    }
    with open("WARP160.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
