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
    depth_order_inv: jnp.ndarray  # [N] int32 inverse permutation (original id -> rank)
    pair_valid: jnp.ndarray  # [cap] bool
    tile_start: jnp.ndarray  # [T] int32 segment start (multiple of G)
    tile_count: jnp.ndarray  # [T] int32 true pair count per tile
    tile_nchunks: jnp.ndarray  # [T] int32 = padded_count / G
    num_pairs: jnp.ndarray  # [] int32 total raw pairs (overflow if > max_pairs)
    num_padded: jnp.ndarray  # [] int32 total padded slots used (overflow if > cap)
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

    # COST MODEL (measured on v5e, examples/profile_primitives.py): elementwise
    # gathers/scatters at pair scale cost ~8 ns/element — 30-40 ms per 4M-sized
    # op — while lax.sort is ~6 ms and cumsum/cummax scans are cheap. So this
    # chain is expressed in sorts (carrying payloads instead of gathering them
    # afterwards) and segment-start scatter + cummax forward-fills (legal
    # whenever the filled value is non-decreasing), keeping only ONE
    # pair-scale scatter (the padded-slot placement).

    # Depth-rank trick: sort the N gaussians by (is-culled, depth) once (stable
    # => ties break by gaussian index, identical to the CUDA pair sort's stable
    # radix tie order, rasterizer_impl.cu:277-303), emit pairs in that order,
    # then a single-key stable sort by tile id preserves depth order within each
    # tile. Payloads ride the sort: per-gaussian fields need no post-sort
    # gather. The leading is-culled key moves zero-touched gaussians to the END
    # of the rank order — they emit no pairs, so pair order is unchanged, but
    # now every OWNING rank's segment start `offsets[r]` is distinct, which
    # collapses the per-pair attribute fills below to ONE scatter (the round-3
    # trace put the previous four rank-packed scatter+cummax fills at ~21 ms).
    iota_n = jnp.arange(n, dtype=jnp.int32)
    rect_code_all = (
        g.rect_min[:, 0]
        | (g.rect_min[:, 1] << 10)
        | ((g.rect_max[:, 0] - g.rect_min[:, 0]) << 20)
    ).astype(jnp.int32)  # 10 bits each: <= 1023 tiles per axis (16k x 16k px)
    touched_all = g.tiles_touched.astype(jnp.int32)
    _, _, touched, rect_code, order = jax.lax.sort(
        ((touched_all == 0).astype(jnp.int32), g.depth, touched_all, rect_code_all, iota_n),
        num_keys=2,
        is_stable=True,
    )
    # Inverse permutation (original id -> rank): the depth-order row permute's
    # custom VJP gathers cotangents at this instead of XLA's default row
    # scatter — the single largest op of the whole backward in the round-3
    # trace (30.6 ms for scatter[600k, 16] vs ~5 ms for the gather).
    order_inv = jnp.zeros((n,), jnp.int32).at[order].set(iota_n)

    offsets = jnp.cumsum(touched) - touched  # exclusive prefix sum
    total = offsets[-1] + touched[-1]

    # Per-pair gaussian attributes from ONE pair-scale scatter: every owning
    # rank seeds `rect_code + 1` at its (distinct) segment start; everything
    # else derives from the seed array by scans:
    #   - rank_p: owners are a prefix of the rank order (culled ranks sort to
    #     the end), so #seeds at positions <= p equals owner_rank + 1;
    #   - off_p (owner's first pair index) = position of the last seed <= p,
    #     a cummax over seeded iota;
    #   - rect fields = the last seed's value, a "latest non-zero" fill
    #     (associative: f(a, b) = b if b else a).
    # (Measured negative results, round 3: packing the old four fills into one
    # [N, 4] row scatter was SLOWER — 4-lane minor dim pads to 128 lanes.)
    p = jnp.arange(max_pairs, dtype=jnp.int32)
    owner_off = jnp.where(touched > 0, offsets, max_pairs)  # culled -> dropped
    rect_seed = (
        jnp.zeros((max_pairs,), jnp.int32).at[owner_off].set(rect_code + 1, mode="drop")
    )
    started = rect_seed > 0
    gi = jnp.clip(jnp.cumsum(started.astype(jnp.int32)) - 1, 0, n - 1)
    off_p = jax.lax.cummax(jnp.where(started, p, 0))
    key = jax.lax.associative_scan(lambda a, b: jnp.where(b > 0, b, a), rect_seed) - 1
    rx0 = key & 0x3FF
    ry0 = (key >> 10) & 0x3FF
    rw_safe = jnp.maximum((key >> 20) & 0x3FF, 1)

    k = p - off_p
    dy = k // rw_safe
    dx = k - dy * rw_safe
    tile = (ry0 + dy) * grid_x + (rx0 + dx)
    valid = p < total
    tile = jnp.where(valid, tile, n_tiles)  # sentinel sorts to the end

    # Stable sort by tile, carrying the gaussian rank as payload (avoids a
    # gi[p_s] gather; stability preserves the depth order within each tile).
    tile_s, gi_s = jax.lax.sort((tile, gi), num_keys=1, is_stable=True)

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

    # dest = aligned_start[t] + (p - seg_start[t]). delta = aligned - start is
    # non-decreasing over tiles, so the per-pair value comes from another
    # segment-start scatter + cummax fill (empty tiles share a start; .max keeps
    # the largest delta, which belongs to the tile that owns the pairs).
    delta = aligned_start - seg_start
    dseg = jnp.zeros((max_pairs,), jnp.int32).at[seg_start].max(delta, mode="drop")
    in_range = tile_s < n_tiles
    dest_sorted = jnp.where(
        in_range, jnp.arange(max_pairs, dtype=jnp.int32) + jax.lax.cummax(dseg), cap
    )  # out-of-range dests are dropped by scatter; strictly increasing where valid

    gauss_idx = jnp.full((cap,), n, dtype=jnp.int32)
    gauss_idx = gauss_idx.at[dest_sorted].set(gi_s, mode="drop")
    pair_valid = gauss_idx < n

    pair_offsets = jnp.minimum(
        jnp.append(offsets, total).astype(jnp.int32), max_pairs
    )

    return BinnedPairs(
        gauss_idx=gauss_idx,
        depth_order=order,
        depth_order_inv=order_inv,
        pair_valid=pair_valid,
        tile_start=aligned_start,
        tile_count=counts,
        tile_nchunks=padded_counts // chunk,
        num_pairs=total,
        num_padded=num_padded,
        pair_offsets=pair_offsets,
    )


def compact_active_tiles(tile_count: jnp.ndarray, max_active: int):
    """(active_ids [max_active] i32, n_active []): the ids of NON-EMPTY tiles,
    in tile order, padded with the sentinel T. Most of a typical capture's tile
    grid is empty background; blending only the active tiles saves the Pallas
    grid-step overhead (~0.35 us/tile x fwd+bwd) and the empty-block writes.
    `max_active` is a static capacity like max_pairs: n_active > max_active
    means truncation (detected via RasterAux.num_active, host auto-retry)."""
    t = tile_count.shape[0]
    nonempty = (tile_count > 0).astype(jnp.int32)
    ids = jnp.arange(t, dtype=jnp.int32)
    _, ids_s = jax.lax.sort((1 - nonempty, ids), num_keys=1, is_stable=True)
    n_active = nonempty.sum()
    k = min(max_active, t)
    act = jnp.where(jnp.arange(k) < n_active, ids_s[:k], t).astype(jnp.int32)
    if max_active > t:
        act = jnp.pad(act, (0, max_active - t), constant_values=t)
    return act, n_active


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gather_rows_soa(src, idx, pair_offsets, n: int, nf: int):
    """src [N, F] row gather -> [F, cap] SoA, with a SORT-BASED segment-sum
    backward. XLA's default VJP for this gather is a pair-scale scatter-add
    (~170 ms at 2M pairs, v5e); a reorder expressed as `lax.sort` with the
    cotangent columns as payloads runs at VPU speed instead (~18 ms — TPU
    gathers/scatters are descriptor-rate-bound at ~10-25 ns/row regardless of
    width, sorts are fully vectorized; examples/profile_candidates2.py).

    idx entries >= n are padding and receive/propagate nothing. `nf` is the
    number of leading fields that carry real data (the rest are layout padding:
    zero cotangents, skipped in the backward)."""
    idx_c = jnp.minimum(idx, src.shape[0] - 1)
    data = src[idx_c].T
    return jnp.where((idx < n)[None, :], data, 0.0)


def _gather_rows_fwd(src, idx, pair_offsets, n, nf):
    return _gather_rows_soa(src, idx, pair_offsets, n, nf), (idx, pair_offsets)


def _gather_rows_bwd(n, nf, res, ct):
    idx, pair_offsets = res
    cap = ct.shape[1]
    f = ct.shape[0]
    # Group cotangent slots by depth-rank gaussian: single-key sort on the
    # rank (padding slots carry rank n and sink to the end), cotangent columns
    # ride as payloads. Within-rank order is irrelevant — they get summed.
    sorted_cols = jax.lax.sort(
        (idx,) + tuple(ct[i] for i in range(nf)), num_keys=1, is_stable=False
    )[1:]
    # LAYOUT: keep fields on the sublane axis, cap on the LANE axis. The
    # [cap, nf] alternative pads nf -> 128 lanes (12.8x), and a cumsum's log2
    # shifted-add passes over that padded layout move ~45 GB at 2M cap
    # (~55 ms, v5e) — measured as the single largest cost of the whole
    # backward. [nf, cap] keeps every pass fully lane-utilized (~4 ms).
    csum = jnp.cumsum(jnp.stack(sorted_cols, axis=0), axis=1)  # [nf, cap]
    # Rank r's segment is [offsets[r], offsets[r+1]) (emission counts survive
    # the tile sort unchanged; capacity-overflow drops invalidate the step and
    # trigger the host-level retry, so exactness under overflow is not needed).
    # d_src[r] = csum[off[r+1]-1] - csum[off[r]-1]. Boundary extraction as a
    # ROW gather on the transposed csum: lane-axis takes run at ~29 ns/index vs
    # ~8 ns/row for row gathers (measured, v5e) — the transpose's extra HBM
    # pass is far cheaper than the 3.6x descriptor-rate penalty.
    ends = jnp.minimum(pair_offsets, cap)  # [n+1]
    rows = csum.T[jnp.maximum(ends - 1, 0)]  # [n+1, nf]
    rows = jnp.where((ends > 0)[:, None], rows, 0.0)
    d_src = rows[1:] - rows[:-1]  # [n, nf] in depth-rank space
    if nf < f:
        d_src = jnp.pad(d_src, ((0, 0), (0, f - nf)))
    f0 = lambda shape: np.zeros(shape, jax.dtypes.float0)
    return d_src, f0(idx.shape), f0(pair_offsets.shape)


_gather_rows_soa.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@jax.custom_vjp
def _permute_rows(src, perm, inv_perm):
    """src[perm] with a GATHER-transposed VJP: d_src = ct[inv_perm].

    For a permutation, scatter(zeros, perm, ct) == gather(ct, inv_perm); XLA's
    default VJP picks the scatter, which runs at element-descriptor rate on
    TPU (~30 ms at [600k, 16], the top op of the round-3 step trace) — the
    row gather runs ~6x faster."""
    return src[perm]


def _permute_rows_fwd(src, perm, inv_perm):
    return src[perm], (perm, inv_perm)


def _permute_rows_bwd(res, ct):
    perm, inv_perm = res
    f0 = lambda shape: np.zeros(shape, jax.dtypes.float0)
    return ct[inv_perm], f0(perm.shape), f0(inv_perm.shape)


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


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
    nf = 6 + c  # real fields; rows beyond carry structural zeros
    # pair slots index in depth-rank space; custom VJP keeps the backward a gather
    src = _permute_rows(src, binned.depth_order, binned.depth_order_inv)
    return _gather_rows_soa(
        src, binned.gauss_idx, binned.pair_offsets, g.mean2d.shape[0], nf
    )
