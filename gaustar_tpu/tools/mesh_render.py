"""Triangle-mesh depth/mask rendering in JAX.

Replaces the reference's aitviewer-based depth/mask preprocessing
(data_process/render_depth_from_mesh.py:13-101: render HumanRF meshes to
per-camera depth .npz + alpha .png, invalid depth = 999) and the ActorsHQ
toolbox's OpenGL mesh rasterizer (mesh_tools/renderer/main.cpp) — TPU-native:
the same tile machinery as the gaussian rasterizer, but with a z-buffer min
reduction instead of alpha blending (order-independent, so no depth sort).

Not differentiable (preprocessing path); for differentiable surfaces use the
solid-surface gaussian depth render.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gaustar_tpu.cameras import Camera
from gaustar_tpu.ops.projection import TILE

INVALID_DEPTH = 999.0


@functools.partial(jax.jit, static_argnames=("width", "height", "max_pairs", "max_per_tile"))
def _render_depth_impl(tri2d, tri_z, width, height, max_pairs, max_per_tile):
    """tri2d: [F, 3, 2] pixel coords; tri_z: [F, 3] view z. -> depth [H, W]."""
    f = tri2d.shape[0]
    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    n_tiles = grid_x * grid_y

    valid_f = (tri_z > 0.05).all(axis=1)
    lo = jnp.floor(tri2d.min(axis=1) / TILE).astype(jnp.int32)
    hi = jnp.floor(tri2d.max(axis=1) / TILE).astype(jnp.int32) + 1
    lo = jnp.clip(lo, 0, jnp.asarray([grid_x, grid_y]))
    hi = jnp.clip(hi, 0, jnp.asarray([grid_x, grid_y]))
    rw = hi[:, 0] - lo[:, 0]
    touched = jnp.where(valid_f, rw * (hi[:, 1] - lo[:, 1]), 0)

    offsets = jnp.cumsum(touched) - touched
    total = offsets[-1] + touched[-1]
    p = jnp.arange(max_pairs, dtype=jnp.int32)
    fi = jnp.clip(
        jnp.searchsorted(offsets, p, side="right", method="sort").astype(jnp.int32) - 1, 0, f - 1
    )
    k = p - offsets[fi]
    rw_safe = jnp.maximum(rw[fi], 1)
    dy = k // rw_safe
    dx = k - dy * rw_safe
    tile = (lo[fi, 1] + dy) * grid_x + (lo[fi, 0] + dx)
    tile = jnp.where(p < total, tile, n_tiles)

    tile_s, fi_s = jax.lax.sort((tile, fi), num_keys=1, is_stable=True)
    bounds = jnp.searchsorted(tile_s, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left")
    starts = bounds[:-1].astype(jnp.int32)
    counts = (bounds[1:] - bounds[:-1]).astype(jnp.int32)

    # Dense per-tile face lists.
    kk = jnp.arange(max_per_tile, dtype=jnp.int32)
    idx = jnp.minimum(starts[:, None] + kk[None, :], max_pairs - 1)
    face_ids = fi_s[idx]  # [T, K]
    in_seg = kk[None, :] < jnp.minimum(counts[:, None], max_per_tile)

    # Pixel coords per tile.
    t = jnp.arange(n_tiles, dtype=jnp.int32)
    flat = jnp.arange(TILE * TILE, dtype=jnp.int32)
    px = (t % grid_x)[:, None] * TILE + flat[None, :] % TILE
    py = (t // grid_x)[:, None] * TILE + flat[None, :] // TILE
    pix = jnp.stack([px, py], axis=-1).astype(jnp.float32)  # [T, P, 2]

    tri = tri2d[face_ids]  # [T, K, 3, 2]
    z = tri_z[face_ids]  # [T, K, 3]

    def tile_depth(tri_t, z_t, seg_t, pix_t):
        # Edge functions for [K, P] coverage.
        a, b, c = tri_t[:, 0], tri_t[:, 1], tri_t[:, 2]

        def edge(p0, p1):
            return (p1[:, None, 0] - p0[:, None, 0]) * (pix_t[None, :, 1] - p0[:, None, 1]) - (
                p1[:, None, 1] - p0[:, None, 1]
            ) * (pix_t[None, :, 0] - p0[:, None, 0])

        w0 = edge(b, c)
        w1 = edge(c, a)
        w2 = edge(a, b)
        area = w0 + w1 + w2
        pos = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        neg = (w0 <= 0) & (w1 <= 0) & (w2 <= 0)
        inside = (pos | neg) & (jnp.abs(area) > 1e-12) & seg_t[:, None]
        area_safe = jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
        b0 = w0 / area_safe
        b1 = w1 / area_safe
        b2 = w2 / area_safe
        # Perspective-correct depth: interpolate 1/z barycentrically in screen space.
        inv_z = b0 * (1.0 / z_t[:, 0:1]) + b1 * (1.0 / z_t[:, 1:2]) + b2 * (1.0 / z_t[:, 2:3])
        depth = 1.0 / jnp.maximum(inv_z, 1e-9)
        depth = jnp.where(inside, depth, INVALID_DEPTH)
        return depth.min(axis=0)  # [P]

    depths = jax.vmap(tile_depth)(tri, z, in_seg, pix)  # [T, P]
    img = depths.reshape(grid_y, grid_x, TILE, TILE).transpose(0, 2, 1, 3)
    img = img.reshape(grid_y * TILE, grid_x * TILE)[:height, :width]
    return img, total


def render_mesh_depth(
    verts: np.ndarray,
    faces: np.ndarray,
    camera: Camera,
    max_pairs: int = 1 << 20,
    max_per_tile: int = 2048,
):
    """Render a depth map [H, W] (INVALID_DEPTH where no surface) and the alpha
    mask [H, W] (depth valid)."""
    v = jnp.asarray(verts, jnp.float32)
    view = camera.view
    local = v @ view[:3, :3].T + view[:3, 3]
    z = local[:, 2]
    fx = camera.width / (2.0 * camera.tanfovx)
    fy = camera.height / (2.0 * camera.tanfovy)
    u = fx * local[:, 0] / z + jnp.asarray(camera.cx, jnp.float32)
    vpix = fy * local[:, 1] / z + jnp.asarray(camera.cy, jnp.float32)
    pix = jnp.stack([u, vpix], axis=-1)

    tri2d = pix[jnp.asarray(faces)]
    tri_z = z[jnp.asarray(faces)]
    depth, total = _render_depth_impl(
        tri2d, tri_z, camera.width, camera.height, max_pairs, max_per_tile
    )
    mask = depth < INVALID_DEPTH - 1.0
    return np.asarray(depth), np.asarray(mask), int(total)
