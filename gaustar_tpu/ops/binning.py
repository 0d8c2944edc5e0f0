"""Tile binning: (gaussian, tile) pair expansion, depth sort, per-tile segments.

TPU-native replacement for the CUDA rasterizer's binning stage
(rasterizer_impl.cu:197-338: cub InclusiveSum -> duplicateWithKeys -> radix sort on
[tileID<<32|depth-bits] -> identifyTileRanges). Differences by design:

  - pair expansion is vectorized over a STATIC `max_pairs` capacity (XLA needs
    static shapes; overflow is reported, not UB). The pair->gaussian map comes
    from a scatter(+1 at each gaussian's first pair) + cumsum instead of a
    binary search / sort — one O(N) scatter and one O(max_pairs) scan;
  - the 64-bit key radix sort becomes a stable `lax.sort` on tile_id with the
    PAIR INDEX as payload — pairs are emitted in (depth-rank, rect-row-major)
    order exactly like duplicateWithKeys, and the stable sort preserves that
    order for ties. Carrying the pair index (not the gaussian id) also yields
    the emission->slot permutation `dest`, which makes the gather backward a
    sort-free cumsum (see `_gather_rows_soa`);
  - tile ranges become G-ALIGNED segments: each tile's pair list is scattered
    into a segment whose start is a multiple of the blend chunk size G, padding
    slots marked with gaussian index N. This lets the Pallas blend/backward
    kernels DMA fixed-size chunks without ever crossing a tile boundary.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gaustar_tpu.ops.projection import Gaussians2D


class BinnedPairs(NamedTuple):
    gauss_idx: jnp.ndarray  # [cap] int32 DEPTH-RANK gaussian id per padded pair slot; N = padding
    depth_order: jnp.ndarray  # [N] int32 gaussian index sorted by depth (rank -> original id)
    pair_valid: jnp.ndarray  # [cap] bool
    tile_start: jnp.ndarray  # [T] int32 segment start (multiple of G)
    tile_count: jnp.ndarray  # [T] int32 true pair count per tile
    tile_nchunks: jnp.ndarray  # [T] int32 = padded_count / G
    num_pairs: jnp.ndarray  # [] int32 total raw pairs (overflow if > max_pairs)
    num_padded: jnp.ndarray  # [] int32 total padded slots used (overflow if > cap)
    dest: jnp.ndarray  # [max_pairs] int32 emission pair -> padded slot (cap = dropped)
    pair_offsets: jnp.ndarray  # [N+1] int32 emission segment bounds per DEPTH-RANK gaussian


def padded_capacity(max_pairs: int, n_tiles: int, chunk: int) -> int:
    """Worst-case padded slots: every non-empty tile wastes at most chunk-1."""
    return max_pairs + n_tiles * (chunk - 1)


def default_capacity(max_pairs: int, n_tiles: int, chunk: int, max_padded: int | None) -> int:
    """Capacity of the padded pair array. The worst case reserves chunk-1 slack
    per tile, which at fine chunks dwarfs the real pair count and every
    cap-proportional op (gather/scatter/masks) pays for it — callers that know
    their scenes pass `max_padded` to bound it (overflow is detected via
    num_padded and simply truncates trailing tiles, like max_pairs overflow)."""
    cap = padded_capacity(max_pairs, n_tiles, chunk)
    if max_padded is not None:
        cap = min(cap, max_padded)
    return cap


def bin_gaussians(
    g: Gaussians2D,
    grid_x: int,
    grid_y: int,
    max_pairs: int,
    chunk: int = 256,
    max_padded: int | None = None,
) -> BinnedPairs:
    n = g.mean2d.shape[0]
    n_tiles = grid_x * grid_y
    cap = default_capacity(max_pairs, n_tiles, chunk, max_padded)

    # Depth-rank trick: sort the N gaussians by depth once (stable => ties break by
    # gaussian index, identical to the CUDA pair sort's stable radix tie order),
    # emit pairs in that order, then a SINGLE-KEY stable sort by tile id preserves
    # depth order within each tile. This replaces the reference's 64-bit
    # [tileID<<32|depth-bits] radix sort with one much cheaper sort.
    order = jnp.argsort(g.depth, stable=True).astype(jnp.int32)
    # Pack (rx0, ry0, rect_width) into one int32 so the per-pair expansion needs a
    # single gather (TPU gathers are the expensive primitive here). 10 bits each is
    # enough for <= 1023 tiles per axis (16k x 16k pixels).
    rect_code_all = (
        g.rect_min[:, 0]
        | (g.rect_min[:, 1] << 10)
        | ((g.rect_max[:, 0] - g.rect_min[:, 0]) << 20)
    ).astype(jnp.int32)
    touched = g.tiles_touched.astype(jnp.int32)[order]
    rect_code = rect_code_all[order]

    offsets = jnp.cumsum(touched) - touched  # exclusive prefix sum
    total = offsets[-1] + touched[-1]

    # pair -> depth-rank gaussian: +1 scattered at each gaussian's first pair
    # index, then an inclusive cumsum. Gaussians with touched == 0 collide on the
    # same offset; the cumsum skips them exactly like the reference's prefix-sum
    # offsets do. This replaces a [max_pairs]-sized sorted searchsorted (a full
    # sort on TPU) with one O(N) scatter-add + one O(max_pairs) scan.
    p = jnp.arange(max_pairs, dtype=jnp.int32)
    marks = jnp.zeros((max_pairs,), jnp.int32).at[offsets].add(1, mode="drop")
    gi = jnp.clip(jnp.cumsum(marks) - 1, 0, n - 1)
    k = p - offsets[gi]
    code = rect_code[gi]
    rx0 = code & 0x3FF
    ry0 = (code >> 10) & 0x3FF
    rw_safe = jnp.maximum(code >> 20, 1)
    dy = k // rw_safe
    dx = k - dy * rw_safe
    tile = (ry0 + dy) * grid_x + (rx0 + dx)
    valid = p < total
    tile = jnp.where(valid, tile, n_tiles)  # sentinel sorts to the end

    # Stable sort by tile with the PAIR index as payload: p_s is the sorted->
    # emission permutation (pairs of one tile stay in depth order).
    tile_s, p_s = jax.lax.sort((tile, p), num_keys=1, is_stable=True)
    gi_s = gi[p_s]  # DEPTH-RANK gaussian per sorted pair

    # Per-tile [start, end) in the compact sorted order: segments are contiguous, so
    # one searchsorted over T+1 boundaries gives both starts and counts.
    tile_ids = jnp.arange(n_tiles + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(tile_s, tile_ids, side="left").astype(jnp.int32)
    seg_start = bounds[:-1]
    counts = bounds[1:] - seg_start

    # G-aligned destination segments.
    padded_counts = ((counts + chunk - 1) // chunk) * chunk
    aligned_start = jnp.cumsum(padded_counts) - padded_counts
    num_padded = aligned_start[-1] + padded_counts[-1]

    # dest = aligned_start[t] + (p - seg_start[t]): one gather of the delta.
    delta = aligned_start - seg_start
    in_range = tile_s < n_tiles
    dest_sorted = jnp.where(
        in_range,
        jnp.arange(max_pairs, dtype=jnp.int32) + delta[jnp.minimum(tile_s, n_tiles - 1)],
        cap,
    )  # out-of-range dests are dropped by scatter

    gauss_idx = jnp.full((cap,), n, dtype=jnp.int32)
    gauss_idx = gauss_idx.at[dest_sorted].set(gi_s, mode="drop")
    pair_valid = gauss_idx < n

    # Emission-order destination map (p_s is a permutation of arange(max_pairs),
    # so every slot is written). Slots whose scatter overflowed cap keep the cap
    # sentinel so the gather backward drops them symmetrically.
    dest = jnp.zeros((max_pairs,), jnp.int32).at[p_s].set(
        jnp.minimum(dest_sorted, cap)
    )

    pair_offsets = jnp.minimum(
        jnp.append(offsets, total).astype(jnp.int32), max_pairs
    )

    return BinnedPairs(
        gauss_idx=gauss_idx,
        depth_order=order,
        pair_valid=pair_valid,
        tile_start=aligned_start,
        tile_count=counts,
        tile_nchunks=padded_counts // chunk,
        num_pairs=total,
        num_padded=num_padded,
        dest=dest,
        pair_offsets=pair_offsets,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _gather_rows_soa(src, idx, dest, pair_offsets, n: int):
    """src [N, F] row gather -> [F, cap] SoA, with a SORT-FREE segment-sum
    backward: pairs in emission order are already grouped by (depth-rank)
    gaussian, so d_src = cumsum over the emission-permuted cotangent + a
    boundary difference at `pair_offsets` — no sort, no scatter-add (XLA's
    default VJP for this gather costs tens of ms at multi-million caps).
    idx entries >= n are padding and receive/propagate nothing."""
    idx_c = jnp.minimum(idx, src.shape[0] - 1)
    data = src[idx_c].T
    return jnp.where((idx < n)[None, :], data, 0.0)


def _gather_rows_fwd(src, idx, dest, pair_offsets, n):
    return _gather_rows_soa(src, idx, dest, pair_offsets, n), (idx.shape, dest, pair_offsets)


def _gather_rows_bwd(n, res, ct):
    idx_shape, dest, pair_offsets = res
    cap = ct.shape[1]
    # Cotangent rows in emission order: slots dropped at scatter time (dest ==
    # cap) contribute nothing; padding slots are never pointed to by dest.
    dest_c = jnp.minimum(dest, cap - 1)
    g_e = jnp.where((dest < cap)[:, None], ct.T[dest_c], 0.0)  # [max_pairs, F]
    csum = jnp.cumsum(g_e, axis=0)
    lo = pair_offsets[:-1]
    hi = pair_offsets[1:]
    top = jnp.where((hi > 0)[:, None], csum[jnp.maximum(hi - 1, 0)], 0.0)
    bot = jnp.where((lo > 0)[:, None], csum[jnp.maximum(lo - 1, 0)], 0.0)
    d_src = top - bot  # [N, F] in depth-rank space (matches src's row order)
    f0 = lambda shape: np.zeros(shape, jax.dtypes.float0)
    return d_src, f0(idx_shape), f0(dest.shape), f0(pair_offsets.shape)


_gather_rows_soa.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def gather_pair_data(g: Gaussians2D, binned: BinnedPairs, fields: int = 16) -> jnp.ndarray:
    """Differentiable gather of per-pair blend data, SoA layout [fields, cap].

    Field rows (consumed by the blend kernels):
      0: mean2d.x  1: mean2d.y  2: conic.A  3: conic.B  4: conic.C  5: opacity
      6..6+C: features (RGB, depth-as-color, or RGB+depth fused)  rest: zero.
    Padding slots are zeroed (opacity 0 => no contribution, no gradient).
    SoA keeps Pallas HBM DMA slices [fields, chunk] lane-aligned (chunk % 128 == 0).
    """
    c = g.color.shape[-1]
    src = jnp.concatenate(
        [g.mean2d, g.conic, g.opacity[:, None], g.color], axis=-1
    )  # [N, 6+C] — built once so the hot path is a SINGLE wide row gather
    assert fields >= src.shape[-1], f"fields={fields} too small for C={c}"
    if fields > src.shape[-1]:
        src = jnp.pad(src, ((0, 0), (0, fields - src.shape[-1])))
    src = src[binned.depth_order]  # pair slots index in depth-rank space
    return _gather_rows_soa(
        src, binned.gauss_idx, binned.dest, binned.pair_offsets, g.mean2d.shape[0]
    )
