"""Tile blending in pure XLA (vmap over tiles) — the portable production path.

Numerically identical to renderCUDA (forward.cu:261-374): front-to-back alpha
blending in closed cumulative form (see rasterizer_ref.blend_prefix_ops), over the
G-aligned per-tile segments produced by binning. Fully differentiable by JAX
autodiff. Used for CPU execution/tests and as the parity target for the Pallas
kernels; the Pallas path replaces it on TPU where per-tile dynamic trip counts and
VMEM-resident chunks beat the dense [T, K] gather this path materializes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaustar_tpu.ops.binning import BinnedPairs
from gaustar_tpu.ops.projection import TILE
from gaustar_tpu.ops.rasterizer_ref import blend_prefix_ops, clamp_alpha_ste


class TileRender(NamedTuple):
    color: jnp.ndarray  # [T, P, C] P = TILE*TILE pixels, no background
    final_T: jnp.ndarray  # [T, P]
    n_contrib: jnp.ndarray  # [T, P] int32 (1-based)


def tile_pixel_coords(grid_x: int, n_tiles: int, tile_offset=0):
    """Pixel centers for tiles [tile_offset, tile_offset + n_tiles), [T, P, 2]
    float32 (row-major within tile). `tile_offset` may be traced (used by the
    gaussian-axis sharded path where each device owns a strip of tiles)."""
    t = jnp.arange(n_tiles, dtype=jnp.int32) + tile_offset
    tx = t % grid_x
    ty = t // grid_x
    flat = jnp.arange(TILE * TILE, dtype=jnp.int32)
    lx = flat % TILE
    ly = flat // TILE
    px = tx[:, None] * TILE + lx[None, :]
    py = ty[:, None] * TILE + ly[None, :]
    return jnp.stack([px, py], axis=-1).astype(jnp.float32)


def blend_tile_range(
    pair_data: jnp.ndarray,  # [F, cap] (SoA, see binning.gather_pair_data)
    tile_start: jnp.ndarray,  # [T_local] start of each tile's segment in pair_data
    tile_count: jnp.ndarray,  # [T_local] true pair count per tile
    grid_x: int,
    max_per_tile: int,
    channels: int = 3,
    tile_offset=0,
) -> TileRender:
    """Dense blend of a contiguous range of tiles. `max_per_tile` is the static
    per-tile pair capacity: tiles with more pairs are truncated (report via
    binned counts; raise capacity)."""
    cap = pair_data.shape[1]
    n_local = tile_start.shape[0]

    k = jnp.arange(max_per_tile, dtype=jnp.int32)
    idx = tile_start[:, None] + k[None, :]  # [T, K]
    in_seg = k[None, :] < jnp.minimum(tile_count[:, None], max_per_tile)
    idx = jnp.minimum(idx, cap - 1)
    sub = pair_data.T[idx]  # [T, K, F] differentiable gather
    sub = jnp.where(in_seg[..., None], sub, 0.0)

    pix = tile_pixel_coords(grid_x, n_local, tile_offset)  # [T, P, 2]

    def blend_one(tile_pairs, tile_pix):
        # tile_pairs: [K, F], tile_pix: [P, 2]
        dx = tile_pairs[:, 0:1] - tile_pix[None, :, 0]  # [K, P]
        dy = tile_pairs[:, 1:2] - tile_pix[None, :, 1]
        A, B, C = tile_pairs[:, 2:3], tile_pairs[:, 3:4], tile_pairs[:, 4:5]
        opac = tile_pairs[:, 5:6]
        power = -0.5 * (A * dx * dx + C * dy * dy) - B * dx * dy
        araw = clamp_alpha_ste(opac * jnp.exp(power))
        contrib = (power <= 0.0) & (araw >= 1.0 / 255.0)
        a0 = jnp.where(contrib, araw, 0.0)
        a_eff, t_before, included = blend_prefix_ops(a0, contrib)
        w = a_eff * t_before  # [K, P]
        color = jnp.einsum("kp,kc->pc", w, tile_pairs[:, 6 : 6 + channels])
        final_t = jnp.prod(1.0 - a_eff, axis=0)
        pos = jnp.arange(1, tile_pairs.shape[0] + 1, dtype=jnp.int32)[:, None]
        n_contrib = jnp.max(jnp.where(included, pos, 0), axis=0, initial=0)
        return color, final_t, n_contrib

    color, final_t, n_contrib = jax.vmap(blend_one)(sub, pix)
    return TileRender(color=color, final_T=final_t, n_contrib=n_contrib)


def blend_tiles_jax(
    pair_data: jnp.ndarray,  # [F, cap] (SoA, see binning.gather_pair_data)
    binned: BinnedPairs,
    grid_x: int,
    grid_y: int,
    max_per_tile: int,
    channels: int = 3,
) -> TileRender:
    """Dense per-tile blend over the full grid (see blend_tile_range)."""
    del grid_y  # implied by len(binned.tile_start)
    return blend_tile_range(
        pair_data, binned.tile_start, binned.tile_count, grid_x, max_per_tile, channels
    )


def assemble_image(tiles: jnp.ndarray, grid_x: int, grid_y: int, width: int, height: int):
    """[T, P, C] tile blocks -> [H, W, C] image (cropping the tile padding)."""
    c = tiles.shape[-1]
    img = tiles.reshape(grid_y, grid_x, TILE, TILE, c)
    img = img.transpose(0, 2, 1, 3, 4).reshape(grid_y * TILE, grid_x * TILE, c)
    return img[:height, :width]


def assemble_image_cm(tiles_cm: jnp.ndarray, grid_x: int, grid_y: int, width: int, height: int):
    """[T, C, P] channel-major tile blocks -> [C, H, W] in ONE relayout.

    The pallas blend emits its raw state [T, 8, PIX]; assembling ALL maps
    (color, final_T, n_contrib, depth) through this single transpose replaces
    one [T,P,C]->[H,W,C] relayout PER map plus the [T,C,P]->[T,P,C] kernel
    transpose (ROOFLINE r3: ~15 ms f+b of the step). Channel-major [C, H, W]
    also keeps H*W on the lane axis — C=3..8 in the minor dim wastes 125 of
    128 lanes on every downstream elementwise op."""
    c = tiles_cm.shape[1]
    img = tiles_cm.reshape(grid_y, grid_x, c, TILE, TILE)
    img = img.transpose(2, 0, 3, 1, 4).reshape(c, grid_y * TILE, grid_x * TILE)
    return img[:, :height, :width]
