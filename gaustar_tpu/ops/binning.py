"""Tile binning: (gaussian, tile) pair expansion, depth sort, per-tile segments.

TPU-native replacement for the CUDA rasterizer's binning stage
(rasterizer_impl.cu:197-338: cub InclusiveSum -> duplicateWithKeys -> radix sort on
[tileID<<32|depth-bits] -> identifyTileRanges). Differences by design:

  - pair expansion is the vectorized searchsorted-repeat trick over a STATIC
    `max_pairs` capacity (XLA needs static shapes; overflow is reported, not UB);
  - the 64-bit key radix sort becomes a stable lexicographic `lax.sort` on
    (tile_id, depth) with the gaussian index as payload — same order semantics:
    pairs are emitted in (gaussian, rect-row-major) order exactly like
    duplicateWithKeys, and the stable sort preserves that order for ties;
  - tile ranges become G-ALIGNED segments: each tile's pair list is scattered into
    a segment whose start is a multiple of the blend chunk size G, padding slots
    marked with gaussian index N. This lets the Pallas blend/backward kernels DMA
    fixed-size chunks without ever crossing a tile boundary.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaustar_tpu.ops.projection import Gaussians2D


class BinnedPairs(NamedTuple):
    gauss_idx: jnp.ndarray  # [cap] int32 gaussian id per padded pair slot; N = padding
    pair_valid: jnp.ndarray  # [cap] bool
    tile_start: jnp.ndarray  # [T] int32 segment start (multiple of G)
    tile_count: jnp.ndarray  # [T] int32 true pair count per tile
    tile_nchunks: jnp.ndarray  # [T] int32 = padded_count / G
    num_pairs: jnp.ndarray  # [] int32 total raw pairs (overflow if > max_pairs)
    num_padded: jnp.ndarray  # [] int32 total padded slots used (overflow if > cap)


def padded_capacity(max_pairs: int, n_tiles: int, chunk: int) -> int:
    """Worst-case padded slots: every non-empty tile wastes at most chunk-1."""
    return max_pairs + n_tiles * (chunk - 1)


def bin_gaussians(
    g: Gaussians2D,
    grid_x: int,
    grid_y: int,
    max_pairs: int,
    chunk: int = 256,
) -> BinnedPairs:
    n = g.mean2d.shape[0]
    n_tiles = grid_x * grid_y
    cap = padded_capacity(max_pairs, n_tiles, chunk)

    touched = g.tiles_touched.astype(jnp.int32)
    offsets = jnp.cumsum(touched) - touched  # exclusive prefix sum
    total = offsets[-1] + touched[-1]

    p = jnp.arange(max_pairs, dtype=jnp.int32)
    gi = jnp.clip(jnp.searchsorted(offsets, p, side="right").astype(jnp.int32) - 1, 0, n - 1)
    k = p - offsets[gi]
    rw = (g.rect_max[gi, 0] - g.rect_min[gi, 0]).astype(jnp.int32)
    rw_safe = jnp.maximum(rw, 1)
    dy = k // rw_safe
    dx = k - dy * rw_safe
    tile = (g.rect_min[gi, 1] + dy) * grid_x + (g.rect_min[gi, 0] + dx)
    valid = p < total
    tile = jnp.where(valid, tile, n_tiles)  # sentinel sorts to the end

    depth = jnp.where(valid, g.depth[gi], jnp.inf)
    tile_s, _, gi_s, valid_s = jax.lax.sort(
        (tile, depth, gi, valid), num_keys=2, is_stable=True
    )

    # Per-tile [start, end) in the compact sorted order.
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    seg_start = jnp.searchsorted(tile_s, tile_ids, side="left").astype(jnp.int32)
    seg_end = jnp.searchsorted(tile_s, tile_ids, side="right").astype(jnp.int32)
    counts = seg_end - seg_start

    # G-aligned destination segments.
    padded_counts = ((counts + chunk - 1) // chunk) * chunk
    aligned_start = jnp.cumsum(padded_counts) - padded_counts
    num_padded = aligned_start[-1] + padded_counts[-1]

    in_range = tile_s < n_tiles
    rank = jnp.arange(max_pairs, dtype=jnp.int32) - seg_start[jnp.minimum(tile_s, n_tiles - 1)]
    dest = jnp.where(
        in_range, aligned_start[jnp.minimum(tile_s, n_tiles - 1)] + rank, cap
    )  # out-of-range dests are dropped by scatter

    gauss_idx = jnp.full((cap,), n, dtype=jnp.int32)
    gauss_idx = gauss_idx.at[dest].set(gi_s, mode="drop")
    pair_valid = gauss_idx < n

    return BinnedPairs(
        gauss_idx=gauss_idx,
        pair_valid=pair_valid,
        tile_start=aligned_start,
        tile_count=counts,
        tile_nchunks=padded_counts // chunk,
        num_pairs=total,
        num_padded=num_padded,
    )


def gather_pair_data(g: Gaussians2D, binned: BinnedPairs, fields: int = 16) -> jnp.ndarray:
    """Differentiable gather of per-pair blend data [cap, fields].

    Field layout (consumed by the blend kernels):
      0: mean2d.x  1: mean2d.y  2: conic.A  3: conic.B  4: conic.C  5: opacity
      6..6+C: features (RGB or depth-as-color)  rest: zero padding.
    Padding slots are zeroed (opacity 0 => no contribution, no gradient).
    """
    idx = jnp.minimum(binned.gauss_idx, g.mean2d.shape[0] - 1)
    c = g.color.shape[-1]
    data = jnp.concatenate(
        [
            g.mean2d[idx],
            g.conic[idx],
            g.opacity[idx, None],
            g.color[idx],
        ],
        axis=-1,
    )
    pad = fields - data.shape[-1]
    assert pad >= 0, f"fields={fields} too small for C={c}"
    if pad:
        data = jnp.pad(data, ((0, 0), (0, pad)))
    return jnp.where(binned.pair_valid[:, None], data, 0.0)
