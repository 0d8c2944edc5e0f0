"""Per-stage timing of the binning chain at reference scale on the real chip.

Isolates: depth argsort / pair-expansion (marks+cumsum+gathers) / tile sort /
scatters / pair-data gather / blend fwd / blend bwd — the candidates for the
next kernel-fusion round (ROOFLINE.md feeds from this).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from gaustar_tpu.cameras import stack_cameras, index_camera
from gaustar_tpu.mesh.primitives import uv_sphere
from gaustar_tpu.models import sugar
from gaustar_tpu.ops import binning
from gaustar_tpu.ops.projection import TILE, preprocess
from gaustar_tpu.utils.profiling import loop_bench
from gaustar_tpu.utils.synthetic import ring_cameras

W, H = 1600, 1024
N_LAT, N_LON = 201, 250
MAX_PAIRS = 1 << 22
MAX_PADDED = (1 << 22) + (1 << 21)
CHUNK = 256

verts, faces = uv_sphere(N_LAT, N_LON, radius=0.6, center=(0.0, 0.0, 4.0))
params, config = sugar.init_sugar(verts, faces)
camera = ring_cameras(1, w=W, h=H, focal=1600.0)[0]
grid_x = (W + TILE - 1) // TILE
grid_y = (H + TILE - 1) // TILE
n_tiles = grid_x * grid_y
cap = binning.default_capacity(MAX_PAIRS, n_tiles, CHUNK, MAX_PADDED)

centers = sugar.gaussian_centers(params, config)
cov = sugar.cov3d(params, config)
opac = sugar.strengths(params)
col = jnp.ones((centers.shape[0], 3), jnp.float32) * 0.5
g = jax.jit(lambda m: preprocess(m, cov, opac, col, camera))(centers)
g = jax.tree_util.tree_map(jnp.copy, g)
n = g.mean2d.shape[0]

print("num gaussians:", n, "tiles:", n_tiles, flush=True)


def stage_sortdepth(i, depth):
    order = jnp.argsort(depth + i * 0.0, stable=True).astype(jnp.int32)
    return order.sum().astype(jnp.float32)


def stage_expand(i, depth):
    order = jnp.argsort(depth + i * 0.0, stable=True).astype(jnp.int32)
    rect_code_all = (
        g.rect_min[:, 0] | (g.rect_min[:, 1] << 10) | ((g.rect_max[:, 0] - g.rect_min[:, 0]) << 20)
    ).astype(jnp.int32)
    touched = g.tiles_touched.astype(jnp.int32)[order]
    rect_code = rect_code_all[order]
    offsets = jnp.cumsum(touched) - touched
    p = jnp.arange(MAX_PAIRS, dtype=jnp.int32)
    marks = jnp.zeros((MAX_PAIRS,), jnp.int32).at[offsets].add(1, mode="drop")
    gi = jnp.clip(jnp.cumsum(marks) - 1, 0, n - 1)
    k = p - offsets[gi]
    code = rect_code[gi]
    rx0 = code & 0x3FF
    ry0 = (code >> 10) & 0x3FF
    rw = jnp.maximum(code >> 20, 1)
    dy = k // rw
    dx = k - dy * rw
    tile = (ry0 + dy) * grid_x + (rx0 + dx)
    total = offsets[-1] + touched[-1]
    tile = jnp.where(p < total, tile, n_tiles)
    return (tile.sum() + gi.sum()).astype(jnp.float32)


def _expand(depth):
    order = jnp.argsort(depth, stable=True).astype(jnp.int32)
    rect_code_all = (
        g.rect_min[:, 0] | (g.rect_min[:, 1] << 10) | ((g.rect_max[:, 0] - g.rect_min[:, 0]) << 20)
    ).astype(jnp.int32)
    touched = g.tiles_touched.astype(jnp.int32)[order]
    rect_code = rect_code_all[order]
    offsets = jnp.cumsum(touched) - touched
    p = jnp.arange(MAX_PAIRS, dtype=jnp.int32)
    marks = jnp.zeros((MAX_PAIRS,), jnp.int32).at[offsets].add(1, mode="drop")
    gi = jnp.clip(jnp.cumsum(marks) - 1, 0, n - 1)
    k = p - offsets[gi]
    code = rect_code[gi]
    rx0 = code & 0x3FF
    ry0 = (code >> 10) & 0x3FF
    rw = jnp.maximum(code >> 20, 1)
    dy = k // rw
    dx = k - dy * rw
    tile = (ry0 + dy) * grid_x + (rx0 + dx)
    total = offsets[-1] + touched[-1]
    tile = jnp.where(p < total, tile, n_tiles)
    return tile, p, gi


def stage_sortpairs(i, depth):
    tile, p, gi = _expand(depth + i * 0.0)
    tile_s, p_s = jax.lax.sort((tile, p), num_keys=1, is_stable=True)
    return (tile_s.sum() + p_s.sum()).astype(jnp.float32)


def stage_full_bin(i, depth):
    gg = g._replace(depth=depth + i * 0.0)
    b = binning.bin_gaussians(gg, grid_x, grid_y, MAX_PAIRS, CHUNK, MAX_PADDED)
    return (b.gauss_idx.sum() + b.pair_offsets.sum()).astype(jnp.float32)


def stage_bin_gather(i, depth):
    gg = g._replace(depth=depth + i * 0.0)
    b = binning.bin_gaussians(gg, grid_x, grid_y, MAX_PAIRS, CHUNK, MAX_PADDED)
    pd = binning.gather_pair_data(gg, b)
    return pd.sum()


results = {}
for name, fn in [
    ("argsort_depth", stage_sortdepth),
    ("expand_pairs", stage_expand),
    ("expand+tile_sort", stage_sortpairs),
    ("full_bin (+scatters)", stage_full_bin),
    ("full_bin+gather", stage_bin_gather),
]:
    t = loop_bench(fn, g.depth, iters=8)
    results[name] = t
    print(f"{name:24s} {t*1e3:8.2f} ms", flush=True)

# True pair demand for the scene (reports capacity headroom).
b = jax.jit(
    lambda d: binning.bin_gaussians(g._replace(depth=d), grid_x, grid_y, MAX_PAIRS, CHUNK, MAX_PADDED)
)(g.depth)
print("num_pairs:", int(b.num_pairs), "num_padded:", int(b.num_padded), "cap:", cap)
