"""Synthetic scenes for benchmarks, dry runs, and tests (no dataset needed)."""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from gaustar_tpu.cameras import Camera, stack_cameras
from gaustar_tpu.mesh.primitives import icosphere
from gaustar_tpu.mesh.topology import build_topology
from gaustar_tpu.models import sugar
from gaustar_tpu.ops.losses import edge_lengths, face_areas_normals
from gaustar_tpu.ops.rasterizer import RasterConfig
from gaustar_tpu.train.refine import FrameData, compute_margins
from gaustar_tpu.utils.general import inverse_sigmoid


def ring_cameras(n=4, dist=4.0, w=48, h=48, focal=60.0, center_z=4.0):
    cams = []
    for i in range(n):
        a = 2 * np.pi * i / n
        pos = np.array([dist * np.sin(a), 0.0, center_z - dist * np.cos(a)])
        target = np.array([0.0, 0.0, center_z])
        z = target - pos
        z /= np.linalg.norm(z)
        up = np.array([0.0, -1.0, 0.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=1)
        w2c = np.eye(4)
        w2c[:3, :3] = R.T
        w2c[:3, 3] = -R.T @ pos
        cams.append(Camera.from_w2c(w2c, focal, focal, w / 2, h / 2, w, h))
    return cams


def rig_cameras(n=160, rows=5, dist=4.0, w=48, h=48, focal=60.0, center_z=4.0,
                elev_deg=(-40.0, 40.0)):
    """Multi-elevation capture rig: `rows` rings of cameras on a sphere of
    radius `dist`, elevations spanning `elev_deg`, all looking at the scene
    center — the geometry of the ActorsHQ cylinder rig (cameras at many
    heights, cameras.py:20), unlike the single-ring `ring_cameras`."""
    cams = []
    elevs = np.linspace(elev_deg[0], elev_deg[1], rows)
    per_row = [n // rows + (1 if i < n % rows else 0) for i in range(rows)]
    target = np.array([0.0, 0.0, center_z])
    for ri, (el, nr) in enumerate(zip(elevs, per_row)):
        el = np.deg2rad(el)
        for i in range(nr):
            a = 2 * np.pi * (i + 0.5 * (ri % 2)) / max(nr, 1)
            pos = np.array([
                dist * np.cos(el) * np.sin(a),
                dist * np.sin(el),
                center_z - dist * np.cos(el) * np.cos(a),
            ])
            z = target - pos
            z /= np.linalg.norm(z)
            up = np.array([0.0, -1.0, 0.0])
            x = np.cross(up, z)
            x /= np.linalg.norm(x)
            y = np.cross(z, x)
            R = np.stack([x, y, z], axis=1)
            w2c = np.eye(4)
            w2c[:3, :3] = R.T
            w2c[:3, 3] = -R.T @ pos
            cams.append(Camera.from_w2c(w2c, focal, focal, w / 2, h / 2, w, h))
    return cams


def synthetic_frame(n_cams=4, w=48, h=48, subdiv=1, seed=0, raster_cfg=None, radius=0.6, target_opacity=0.95):
    """(init_params, config, FrameData, target_params, raster_cfg): gt rendered
    from an opaque target model with random vertex colors; trainee starts gray."""
    raster_cfg = raster_cfg or RasterConfig(
        max_pairs=1 << 15, chunk=32, max_per_tile=512, impl="jax"
    )
    rng = np.random.default_rng(seed)
    verts, faces = icosphere(subdiv, radius=radius, center=(0, 0, 4.0))
    colors = rng.uniform(0.2, 0.9, size=(len(verts), 3)).astype(np.float32)

    target_params, config = sugar.init_sugar(verts, faces, vertex_colors=colors)
    target_params = dataclasses.replace(
        target_params, densities=jnp.full_like(target_params.densities, inverse_sigmoid(target_opacity))
    )

    cams = ring_cameras(n_cams, w=w, h=h)
    batch = stack_cameras(cams)

    gts, depths = [], []
    for cam in cams:
        img, _ = sugar.render(target_params, config, cam, bg=(0, 1, 0), raster_config=raster_cfg)
        gts.append(np.asarray(img))
        d, _ = sugar.render_depth(
            target_params, config, cam, max_depth=10.0, raster_config=raster_cfg,
            use_solid_surface=True,
        )
        d = np.asarray(d)
        d = np.where(d > 9.0, 10.5, d)  # background sentinel > max_depth
        depths.append(d)

    topo = build_topology(np.asarray(faces), len(verts))
    ref_edge_len = np.asarray(edge_lengths(jnp.asarray(verts), jnp.asarray(topo.edges)))
    ref_area, _ = face_areas_normals(jnp.asarray(verts), jnp.asarray(faces))

    margins = compute_margins(np.asarray(batch.cx), np.asarray(batch.cy), w, h)
    data = FrameData(
        cameras=batch,
        gt_images=jnp.asarray(np.stack(gts)),
        gt_depths=jnp.asarray(np.stack(depths)),
        margins=jnp.asarray(margins),
        ref_edge_len=jnp.asarray(ref_edge_len),
        ref_area=jnp.asarray(ref_area),
        edges=jnp.asarray(topo.edges),
        adj_faces=jnp.asarray(topo.adj_faces),
    )

    init_params, _ = sugar.init_sugar(verts, faces, vertex_colors=None)
    return init_params, config, data, target_params, raster_cfg


def random_gaussian_scene(n: int, seed=0, z0=4.0, spread=0.4, scale_mu=-4.2):
    """Unbound random gaussian cloud (for rasterizer benchmarks)."""
    rng = np.random.default_rng(seed)
    means = np.concatenate(
        [rng.normal(scale=spread, size=(n, 2)), z0 + rng.uniform(0, 2, (n, 1))], 1
    ).astype(np.float32)
    scales = np.exp(rng.normal(scale_mu, 0.3, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = (1 / (1 + np.exp(-rng.normal(size=n)))).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    return tuple(jnp.asarray(a) for a in (means, scales, quats, opac, colors))
