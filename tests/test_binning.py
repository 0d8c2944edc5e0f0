"""Direct unit tests of the tile-binning stage against a numpy oracle.

bin_gaussians re-architects the CUDA binning chain (rasterizer_impl.cu:197-338:
cub InclusiveSum -> duplicateWithKeys -> 64-bit radix sort -> identifyTileRanges)
as depth-rank sort + one seed scatter + scans + one stable tile sort. These
tests pin the OBSERVABLE contract independent of that plumbing:

  - each tile's padded segment lists exactly the gaussians whose rect covers
    the tile, sorted by (depth, original index) — the CUDA stable-radix order;
  - zero-touched (culled) gaussians emit nothing anywhere;
  - depth_order / depth_order_inv are mutually inverse and rank culled
    gaussians after all emitting ones;
  - pair_offsets segments the emission order by depth rank (the gather
    backward's segment-sum bounds);
  - gather_pair_data's custom-VJP gradient equals the dense scatter-sum.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaustar_tpu.ops.binning import bin_gaussians, gather_pair_data
from gaustar_tpu.ops.projection import Gaussians2D


def _make_gaussians(rng, n, grid_x, grid_y, zero_frac=0.3, tie_depths=False):
    rx0 = rng.integers(0, grid_x, size=n)
    ry0 = rng.integers(0, grid_y, size=n)
    rw = rng.integers(1, 4, size=n)
    rh = rng.integers(1, 4, size=n)
    rx1 = np.minimum(rx0 + rw, grid_x)
    ry1 = np.minimum(ry0 + rh, grid_y)
    culled = rng.random(n) < zero_frac
    rx1 = np.where(culled, rx0, rx1)
    ry1 = np.where(culled, ry0, ry1)
    touched = (rx1 - rx0) * (ry1 - ry0)
    depth = rng.uniform(1.0, 9.0, size=n).astype(np.float32)
    if tie_depths:
        depth = np.round(depth * 2.0) / 2.0  # force many exact ties
    return Gaussians2D(
        mean2d=jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32)),
        depth=jnp.asarray(depth),
        conic=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        opacity=jnp.asarray(rng.uniform(0.1, 1.0, size=n).astype(np.float32)),
        color=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        radius=jnp.asarray(np.where(touched > 0, 3, 0).astype(np.int32)),
        rect_min=jnp.asarray(np.stack([rx0, ry0], -1).astype(np.int32)),
        rect_max=jnp.asarray(np.stack([rx1, ry1], -1).astype(np.int32)),
        tiles_touched=jnp.asarray(touched.astype(np.int32)),
    )


def _oracle_tile_lists(g, grid_x, grid_y):
    """Per tile: gaussian ids covering it, sorted by (depth, id)."""
    n = g.depth.shape[0]
    lists = [[] for _ in range(grid_x * grid_y)]
    order = sorted(range(n), key=lambda i: (float(g.depth[i]), i))
    for i in order:
        if int(g.tiles_touched[i]) == 0:
            continue
        for ty in range(int(g.rect_min[i, 1]), int(g.rect_max[i, 1])):
            for tx in range(int(g.rect_min[i, 0]), int(g.rect_max[i, 0])):
                lists[ty * grid_x + tx].append(i)
    return lists


@pytest.mark.parametrize("tie_depths", [False, True])
def test_bin_gaussians_matches_oracle(tie_depths):
    rng = np.random.default_rng(3 + tie_depths)
    grid_x, grid_y, n, chunk = 5, 4, 60, 8
    g = _make_gaussians(rng, n, grid_x, grid_y, tie_depths=tie_depths)
    total = int(np.asarray(g.tiles_touched).sum())
    b = bin_gaussians(g, grid_x, grid_y, max_pairs=total + 16, chunk=chunk)

    assert int(b.num_pairs) == total
    oracle = _oracle_tile_lists(g, grid_x, grid_y)
    gauss_idx = np.asarray(b.gauss_idx)
    order = np.asarray(b.depth_order)
    starts = np.asarray(b.tile_start)
    counts = np.asarray(b.tile_count)
    nchunks = np.asarray(b.tile_nchunks)
    for t in range(grid_x * grid_y):
        assert counts[t] == len(oracle[t])
        assert nchunks[t] == (counts[t] + chunk - 1) // chunk
        seg = gauss_idx[starts[t] : starts[t] + nchunks[t] * chunk]
        ids = order[seg[seg < n]]  # rank -> original id
        assert list(ids) == oracle[t], f"tile {t}"
        assert (seg[counts[t] :] == n).all()  # padding slots

    # depth_order: emitting gaussians first (by depth, then id), culled last.
    inv = np.asarray(b.depth_order_inv)
    assert (inv[order] == np.arange(n)).all()
    touched = np.asarray(g.tiles_touched)
    n_emit = int((touched > 0).sum())
    assert (touched[order[:n_emit]] > 0).all()
    assert (touched[order[n_emit:]] == 0).all()
    depths = np.asarray(g.depth)[order[:n_emit]]
    assert (np.diff(depths) >= 0).all()

    # pair_offsets: rank r emits offsets[r+1]-offsets[r] pairs.
    po = np.asarray(b.pair_offsets)
    emitted = po[1:] - po[:-1]
    assert (emitted == touched[order]).all()


def test_bin_gaussians_overflow_truncates():
    rng = np.random.default_rng(7)
    grid_x, grid_y, n = 4, 4, 40
    g = _make_gaussians(rng, n, grid_x, grid_y, zero_frac=0.0)
    total = int(np.asarray(g.tiles_touched).sum())
    b = bin_gaussians(g, grid_x, grid_y, max_pairs=total // 2, chunk=8)
    # Overflow is REPORTED (host auto-retry path), not UB.
    assert int(b.num_pairs) == total
    assert int(np.asarray(b.pair_valid).sum()) <= total // 2 + 16 * 7


def test_gather_pair_data_gradient_is_segment_sum():
    rng = np.random.default_rng(11)
    grid_x, grid_y, n, chunk = 4, 3, 30, 8
    g = _make_gaussians(rng, n, grid_x, grid_y)
    total = int(np.asarray(g.tiles_touched).sum())
    b = bin_gaussians(g, grid_x, grid_y, max_pairs=total + 8, chunk=chunk)

    def f(op):
        pd = gather_pair_data(g._replace(opacity=op), b)
        return (pd[5] * jnp.arange(pd.shape[1], dtype=jnp.float32)).sum()

    grad = jax.grad(f)(g.opacity)
    # dense oracle: each gaussian's grad = sum of its slots' weights
    gauss_idx = np.asarray(b.gauss_idx)
    order = np.asarray(b.depth_order)
    expect = np.zeros(n, np.float64)
    for slot, r in enumerate(gauss_idx):
        if r < n:
            expect[order[r]] += slot
    np.testing.assert_allclose(np.asarray(grad), expect, rtol=1e-5)
