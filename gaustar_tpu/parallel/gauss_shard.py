"""Gaussian-axis model parallelism: shard preprocess + binning over gaussians,
blend over tile strips.

The reference has no distributed execution at all (SURVEY §2.1); this is the
second mesh axis sketched in SURVEY §5 for scenes too large for one chip
(>10M gaussians). Design (per device d of D on mesh axis `gauss`):

  1. device d holds gaussians [d*N/D, (d+1)*N/D) and preprocesses them
     (projection / EWA cov2d / tile rects — forward.cu:156-256 semantics via
     ops.projection.preprocess); this is the embarrassingly-parallel axis.
  2. d expands its (gaussian, tile) pairs locally (searchsorted-repeat over a
     static local capacity, like ops.binning).
  3. pair keys (tile, depth, global gaussian id) and the per-gaussian blend
     fields are all_gather'd over the axis — per-GAUSSIAN fields, not per-pair
     fields, so the collective moves O(N*F) + O(pairs*3) bytes instead of
     O(pairs*F).
  4. one 3-key lexicographic sort (tile, depth, gid) reproduces the exact CUDA
     pair order (radix sort on [tileID<<32|depth] with stable gaussian-index
     ties, rasterizer_impl.cu:277-303).
  5. device d blends only its strip of ceil(T/D) tiles (blend_tile_range with a
     traced tile offset) — the pixel-proportional stage scales with D.

The collective cost is one all_gather of the pair keys; compute of every stage
scales 1/D. For camera+gaussian 2D meshes, stack this inside the camera-sharded
step with a 2D Mesh("cam", "gauss").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gaustar_tpu.cameras import Camera
from gaustar_tpu.ops import blend_jax
from gaustar_tpu.ops.projection import TILE, preprocess


def make_gauss_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("gauss",))


def pad_primitives(means3d, cov3d, opacities, colors, multiple: int):
    """Pad the gaussian axis to a multiple of the mesh size with zero-opacity
    gaussians behind the near plane (culled by preprocess)."""
    n = means3d.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return means3d, cov3d, opacities, colors
    means_pad = jnp.zeros((pad, 3), means3d.dtype)  # z=0 -> near-culled
    return (
        jnp.concatenate([means3d, means_pad], axis=0),
        jnp.concatenate([cov3d, jnp.zeros((pad, cov3d.shape[1]), cov3d.dtype)], axis=0),
        jnp.concatenate([opacities.reshape(-1), jnp.zeros((pad,), opacities.dtype)]),
        jnp.concatenate([colors, jnp.zeros((pad, colors.shape[1]), colors.dtype)], axis=0),
    )


def _expand_pairs_local(g, grid_x: int, grid_y: int, cap_local: int):
    """Local (gaussian, tile) pair expansion (ops.binning's searchsorted-repeat,
    without the depth-rank pre-sort — global order is fixed by the 3-key sort).

    Returns (tile [capL], depth [capL], gidx_local [capL], total [])."""
    n = g.mean2d.shape[0]
    n_tiles = grid_x * grid_y
    touched = g.tiles_touched.astype(jnp.int32)
    rect_code = (
        g.rect_min[:, 0]
        | (g.rect_min[:, 1] << 10)
        | ((g.rect_max[:, 0] - g.rect_min[:, 0]) << 20)
    ).astype(jnp.int32)

    offsets = jnp.cumsum(touched) - touched
    total = offsets[-1] + touched[-1]

    p = jnp.arange(cap_local, dtype=jnp.int32)
    gi = jnp.clip(
        jnp.searchsorted(offsets, p, side="right", method="sort").astype(jnp.int32) - 1, 0, n - 1
    )
    k = p - offsets[gi]
    code = rect_code[gi]
    rx0 = code & 0x3FF
    ry0 = (code >> 10) & 0x3FF
    rw = jnp.maximum(code >> 20, 1)
    dy = k // rw
    dx = k - dy * rw
    tile = (ry0 + dy) * grid_x + (rx0 + dx)
    valid = p < total
    tile = jnp.where(valid, tile, n_tiles).astype(jnp.int32)
    depth = jnp.where(valid, g.depth[gi], jnp.inf).astype(jnp.float32)
    return tile, depth, gi, total


def render_gauss_sharded(
    means3d,
    cov3d,
    opacities,
    colors,
    camera: Camera,
    mesh: Mesh,
    bg=(0.0, 0.0, 0.0),
    max_pairs_per_device: int = 1 << 14,
    max_per_tile: int = 512,
    channels: int = 3,
    axis: str = "gauss",
):
    """Render with gaussians sharded over `mesh` axis `axis`.

    Returns (image [H, W, C], num_pairs []) — numerically identical to
    `ops.rasterizer.rasterize(impl='jax')` on one device (same pair order, same
    blend), validated by tests/test_parallel.py."""
    d = mesh.shape[axis]
    W, H = camera.width, camera.height
    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE
    n_tiles = grid_x * grid_y
    tiles_per_dev = -(-n_tiles // d)  # strip size (last strip may pad past T)
    cap_local = max_pairs_per_device

    means3d, cov3d, opacities, colors = pad_primitives(means3d, cov3d, opacities, colors, d)
    n_global = means3d.shape[0]
    shard_n = n_global // d

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P()),
        check_vma=False,
    )
    def run(m3, c3, op, col):
        di = jax.lax.axis_index(axis)
        g = preprocess(m3, c3, op, col, camera)

        tile, depth, gi_local, total_local = _expand_pairs_local(g, grid_x, grid_y, cap_local)
        gid = jnp.where(tile < n_tiles, gi_local + di * shard_n, n_global).astype(jnp.int32)

        # Per-gaussian blend fields: [shard_n, F]; gathered to [N, F].
        src = jnp.concatenate([g.mean2d, g.conic, g.opacity[:, None], g.color], axis=-1)

        tile_all = jax.lax.all_gather(tile, axis, tiled=True)  # [D*capL]
        depth_all = jax.lax.all_gather(depth, axis, tiled=True)
        gid_all = jax.lax.all_gather(gid, axis, tiled=True)
        src_all = jax.lax.all_gather(src, axis, tiled=True)  # [N, F]

        # Exact CUDA pair order: (tile, depth, gaussian id) lexicographic.
        tile_s, _depth_s, gid_s = jax.lax.sort(
            (tile_all, depth_all, gid_all), num_keys=3, is_stable=False
        )

        # Tile segments over the full grid from the sorted tile keys.
        bounds = jnp.searchsorted(
            tile_s, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left", method="sort"
        ).astype(jnp.int32)
        seg_start = bounds[:-1]
        seg_count = bounds[1:] - seg_start

        # Pair blend data for this device's strip only would need dynamic
        # slicing; gather the full [F, P_all] instead (pairs are truncated to
        # max_per_tile inside blend_tile_range anyway).
        gid_c = jnp.minimum(gid_s, n_global - 1)
        pair_data = jnp.where((gid_s < n_global)[None, :], src_all[gid_c].T, 0.0)

        t0 = di * tiles_per_dev
        start_l = jax.lax.dynamic_slice_in_dim(
            jnp.pad(seg_start, (0, tiles_per_dev * d - n_tiles)), t0, tiles_per_dev
        )
        count_l = jax.lax.dynamic_slice_in_dim(
            jnp.pad(seg_count, (0, tiles_per_dev * d - n_tiles)), t0, tiles_per_dev
        )
        tiles = blend_jax.blend_tile_range(
            pair_data, start_l, count_l, grid_x, max_per_tile, channels, tile_offset=t0
        )
        # True demand (pre-truncation): overflow if > d * max_pairs_per_device.
        num_pairs = jax.lax.psum(total_local, axis)
        return tiles.color, tiles.final_T, num_pairs

    color_t, final_t_t, num_pairs = run(means3d, cov3d, opacities, colors)
    color_t = color_t[:n_tiles]
    final_t_t = final_t_t[:n_tiles]
    color = blend_jax.assemble_image(color_t, grid_x, grid_y, W, H)
    final_t = blend_jax.assemble_image(final_t_t[..., None], grid_x, grid_y, W, H)[..., 0]
    img = color + final_t[..., None] * jnp.asarray(bg, jnp.float32)
    return img, num_pairs
