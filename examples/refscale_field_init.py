"""HumanRF-equivalent init-mesh pipeline at REFERENCE scale (VERDICT r2 §2.5:
"the field initializer has never run at 512^3 / 100k-face scale").

Full chain of data_process/humanrf (run.py + trainer.py:630-752) at the
reference's numbers: 40 cameras at 1.6 MP -> occupancy carving from masks
(occupancy_grid_generation.cu equivalent) -> occupancy-tightened ray sampling
(ray_sampler.cu equivalent) -> hash-grid NeRF training -> 512^3 density grid
masked by occupancy -> iso surface -> CC filter -> 10x Laplacian smooth ->
quadric decimation to 100k faces. Synthetic GT (analytic sphere) — the point is
scale + wall-clock + geometric sanity, recorded in FIELD_INIT.json.

Run: timeout 3600 python examples/refscale_field_init.py
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/gaustar_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from gaustar_tpu.models import neural_field as nf
from gaustar_tpu.train import init_mesh
from gaustar_tpu.utils.synthetic import ring_cameras

W, H = 1600, 1024
N_CAMS = 40
CENTER = np.array([0.0, 0.0, 4.0])
RADIUS = 0.6


def analytic_views(cams):
    """(rgb [C,H,W,3], mask [C,H,W]) from the analytic sphere."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    rgbs, masks = [], []
    for cam in cams:
        view = np.asarray(cam.view, np.float64)
        c_cam = view[:3, :3] @ CENTER + view[:3, 3]
        vx = (xx - W / 2.0) / float(np.asarray(cam.fx))
        vy = (yy - H / 2.0) / float(np.asarray(cam.fy))
        a = vx * vx + vy * vy + 1.0
        b = -2.0 * (vx * c_cam[0] + vy * c_cam[1] + c_cam[2])
        c0 = float(c_cam @ c_cam) - RADIUS * RADIUS
        hit = (b * b - 4.0 * a * c0) > 0
        rgbs.append(np.where(hit[..., None], 0.6, 0.0).astype(np.float32))
        masks.append(hit.astype(np.float32))
    return np.stack(rgbs), np.stack(masks)


def main():
    report = {"n_cams": N_CAMS, "resolution": [W, H], "grid_res": 512,
              "occupancy_res": 128, "target_faces": 100_000}
    cams = ring_cameras(N_CAMS, w=W, h=H, focal=1600.0)

    t0 = time.time()
    rgbs, masks = analytic_views(cams)
    report["gt_build_s"] = round(time.time() - t0, 1)

    field_cfg = nf.FieldConfig(
        aabb_min=(-0.8, -0.8, 3.2), aabb_max=(0.8, 0.8, 4.8)
    )
    # rays_per_batch: before the feature-major table relayout
    # (models/neural_field.py HashGridParams) the interleaved [N, F=2]
    # per-level temps tiled to (8, 128) lanes — 64x padding — and batches
    # above ~2k rays OOM'd at this scale (19.5 G needed of 15.75 G). With
    # 1-D per-feature gathers that padding is gone; the measured batch
    # ceiling/throughput curve is FIELD_BATCH.json
    # (examples/profile_field_batch.py). Default stays 2048 so FIELD_INIT.json
    # remains comparable across rounds; raise via GAUSTAR_FIELD_RAYS.
    # HumanRF itself adapts batch size to memory (trainer.py:149-178).
    # iso_level: the reference extracts at mcubes iso=100 (trainer.py:703)
    # AFTER its full multi-hour schedule, where interior densities saturate in
    # the hundreds. At this harness's 1000-iteration budget the trained
    # amplitude is smaller; iso is amplitude-relative, so extract at 10 (the
    # density diagnostic below records the actual inside/outside levels).
    mcfg = init_mesh.InitMeshConfig(
        iterations=int(os.environ.get("GAUSTAR_FIELD_ITERS", "2000")),
        grid_res=512, occupancy_res=128,
        target_faces=100_000,
        rays_per_batch=int(os.environ.get("GAUSTAR_FIELD_RAYS", "2048")),
        iso_level=10.0,
    )

    # NeRF training with occupancy carving (occupancy_grid_generation.cu) +
    # occupancy-tightened ray sampling (ray_sampler.cu) built in.
    t0 = time.time()
    params, field_cfg, occ = init_mesh.train_field(
        cams, jnp.asarray(rgbs), jnp.asarray(masks), mcfg, field_cfg
    )
    report["train_s"] = round(time.time() - t0, 1)
    occ_np = np.asarray(occ)
    report["occupancy_fill_pct"] = round(float(occ_np.mean()) * 100.0, 2)

    # Density diagnostic: trained amplitude at known inside/surface/outside
    # points (makes the iso choice auditable).
    probe = np.stack([
        CENTER,                           # deep inside
        CENTER + [0.5 * RADIUS, 0, 0],    # inside
        CENTER + [RADIUS, 0, 0],          # on the surface
        CENTER + [1.5 * RADIUS, 0, 0],    # outside
    ]).astype(np.float32)
    dens = np.asarray(nf.query_density(params, jnp.asarray(probe), field_cfg)[0]).reshape(-1)
    # Amplitude-relative iso: a quarter of the interior density (clamped to the
    # config as an upper bound). The reference's fixed iso=100 encodes the same
    # idea for ITS training budget, where interiors saturate far above 100.
    iso = float(np.clip(0.25 * dens[1], 1.0, mcfg.iso_level))
    mcfg = dataclasses.replace(mcfg, iso_level=iso)
    report["density_probe"] = {
        "center": round(float(dens[0]), 2), "inside": round(float(dens[1]), 2),
        "surface": round(float(dens[2]), 2), "outside": round(float(dens[3]), 2),
        "iso_level": round(iso, 2),
    }
    print(f"field training ({mcfg.iterations} iters incl. occupancy carve): "
          f"{report['train_s']}s, occ fill {report['occupancy_fill_pct']}%", flush=True)

    # 512^3 density grid -> masked extraction -> smooth -> decimate to 100k.
    t0 = time.time()
    mesh = init_mesh.extract_init_mesh(params, field_cfg, mcfg, occupancy=occ)
    report["extract_s"] = round(time.time() - t0, 1)
    report["mesh_faces"] = int(len(mesh.faces))
    report["mesh_verts"] = int(len(mesh.verts))

    if len(mesh.verts):
        c = mesh.verts.mean(axis=0)
        r = np.linalg.norm(mesh.verts - c, axis=1)
        report["center_err_m"] = round(float(np.linalg.norm(c - CENTER)), 4)
        report["radius_mean_m"] = round(float(r.mean()), 4)
        report["radius_std_m"] = round(float(r.std()), 4)
        print(f"extract 512^3 -> {len(mesh.faces)} faces in {report['extract_s']}s; "
              f"radius {r.mean():.3f}+-{r.std():.3f} (true {RADIUS})", flush=True)

    report["backend"] = jax.default_backend()
    with open("FIELD_INIT.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
