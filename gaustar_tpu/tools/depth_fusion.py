"""Depth-map fusion & point-cloud depth utilities.

Covers internal_use_tools/fusion_depth.py (TSDF-fuse the dataset's GT depth maps
into a mesh) and pcl_to_depth_map.py (splat a point cloud to per-camera depth
maps) — thin compositions over the TPU TSDF volume and camera projections.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gaustar_tpu.mesh import surgery, tsdf
from gaustar_tpu.tools.geometry import project


def fuse_gt_depths(
    depths: np.ndarray,  # [C, H, W], invalid > max_depth or 0
    cmr: dict,  # rgb_cameras.npz arrays
    voxel_size: float = 0.008,
    sdf_trunc: float = 0.02,
    depth_trunc: float = 6.0,
    max_depth: float = 10.0,
    rgbs: np.ndarray | None = None,  # [C, H, W, 3] optional
    max_dim: int = 512,
) -> surgery.Mesh:
    """TSDF-fuse ground-truth depth maps into a mesh (fusion_depth.py)."""
    intr = cmr["intrinsics"]
    extr = cmr["extrinsics"]
    n_cams, h, w = depths.shape

    # Volume bounds from lifted valid depth samples (subsampled).
    pts = []
    for ci in range(n_cams):
        d = depths[ci]
        vv, uu = np.nonzero((d > 0) & (d < max_depth))
        if len(vv) == 0:
            continue
        sel = np.random.default_rng(ci).choice(len(vv), min(2000, len(vv)), replace=False)
        vv, uu = vv[sel], uu[sel]
        z = d[vv, uu]
        fx, fy = intr[ci][0, 0], intr[ci][1, 1]
        cx, cy = intr[ci][0, 2] or w / 2, intr[ci][1, 2] or h / 2
        x = (uu - cx) / fx * z
        y = (vv - cy) / fy * z
        local = np.stack([x, y, z], -1)
        R = extr[ci][:3, :3]
        t = extr[ci][:3, 3]
        pts.append((local - t) @ R)
    pts = np.concatenate(pts)
    vol = tsdf.fit_volume_to_points(pts, voxel_size, sdf_trunc, pad=0.05, max_dim=max_dim)

    for ci in range(n_cams):
        d = np.where((depths[ci] > 0) & (depths[ci] < max_depth), depths[ci], 0.0)
        rgb = rgbs[ci] if rgbs is not None else np.zeros((h, w, 3), np.float32)
        fx, fy = intr[ci][0, 0], intr[ci][1, 1]
        cx = intr[ci][0, 2] or w / 2
        cy = intr[ci][1, 2] or h / 2
        K = jnp.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
        vol = tsdf.integrate(
            vol, jnp.asarray(d, jnp.float32), jnp.asarray(rgb, jnp.float32), K,
            jnp.asarray(extr[ci], jnp.float32), depth_trunc=depth_trunc,
        )

    verts, faces, colors = tsdf.extract_mesh(vol, with_color=rgbs is not None)
    fc = colors[faces].mean(axis=1) if len(faces) else np.zeros((0, 3))
    return surgery.Mesh(verts.astype(np.float64), faces.astype(np.int64), fc)


def points_to_depth_map(points: np.ndarray, intr, extr, shape, splat_radius: int = 1):
    """Z-buffer splat of a point cloud to a depth map (pcl_to_depth_map.py).
    Returns [H, W] with 0 where empty."""
    h, w = shape
    pix, local = project(points, intr, extr, shape, return_local_points=True)
    z = local[:, 2]
    ok = z > 0
    rr = np.round(pix[ok, 0]).astype(int)
    cc = np.round(pix[ok, 1]).astype(int)
    zz = z[ok]
    depth = np.full((h, w), np.inf)
    for dr in range(-splat_radius + 1, splat_radius):
        for dc in range(-splat_radius + 1, splat_radius):
            r = np.clip(rr + dr, 0, h - 1)
            c = np.clip(cc + dc, 0, w - 1)
            np.minimum.at(depth, (r, c), zz)
    depth[~np.isfinite(depth)] = 0.0
    return depth
