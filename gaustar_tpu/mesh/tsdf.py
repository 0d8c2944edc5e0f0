"""TSDF fusion: dense volumetric integration (JAX/TPU) + surface extraction (host).

TPU re-design of the reference's o3d ScalableTSDFVolume usage
(gaustar_trainers/refined_mesh.py:311-459: voxel 8 mm, sdf_trunc 2 cm, RGB-D
integration from 72 orbit + all rig cameras). The hash-based "scalable" volume is
replaced by a DENSE grid over the scene bbox — at 8 mm voxels a human-capture
volume is ~256^3 = 17M voxels, which a TPU integrates per-camera in one fused
elementwise pass (project all voxel centers, sample depth, truncate, running
weighted average), far faster than hash bookkeeping.

Surface extraction uses marching TETRAHEDRA (6 tets/cube, 16 trivially-derived
cases) on host numpy — topologically correct surfaces without the 256-entry MC
lookup table; the slightly higher triangle count is irrelevant to the downstream
mesh surgery which operates on arbitrary fused meshes anyway.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TSDFVolume:
    tsdf: Any  # [X, Y, Z] float32, init 1.0 (truncated "far")
    weight: Any  # [X, Y, Z] float32
    color: Any  # [X, Y, Z, 3] float32 running average
    origin: Any  # [3] world position of voxel (0,0,0) CENTER
    voxel_size: float = dataclasses.field(metadata=dict(static=True))
    sdf_trunc: float = dataclasses.field(metadata=dict(static=True))


def make_volume(origin, dims, voxel_size: float, sdf_trunc: float) -> TSDFVolume:
    x, y, z = dims
    return TSDFVolume(
        tsdf=jnp.ones((x, y, z), jnp.float32),
        weight=jnp.zeros((x, y, z), jnp.float32),
        color=jnp.zeros((x, y, z, 3), jnp.float32),
        origin=jnp.asarray(origin, jnp.float32),
        voxel_size=float(voxel_size),
        sdf_trunc=float(sdf_trunc),
    )


@jax.jit
def integrate(vol: TSDFVolume, depth: jnp.ndarray, rgb: jnp.ndarray, intr: jnp.ndarray, extr: jnp.ndarray, depth_trunc: float = 6.0) -> TSDFVolume:
    """Integrate one RGB-D frame (o3d TSDFVolume.integrate semantics: per-voxel
    projective SDF along the optical axis, clamp to [-1, 1] x trunc, weight 1 per
    observation, running average; invalid depth (0 or > depth_trunc) skipped).

    depth [H, W], rgb [H, W, 3], intr 3x3 (cx, cy explicit), extr 4x4 w2c.
    """
    x, y, z = vol.tsdf.shape
    h, w = depth.shape
    ii, jj, kk = jnp.meshgrid(
        jnp.arange(x), jnp.arange(y), jnp.arange(z), indexing="ij"
    )
    pts = vol.origin + jnp.stack([ii, jj, kk], axis=-1).astype(jnp.float32) * vol.voxel_size
    local = pts @ extr[:3, :3].T + extr[:3, 3]
    zc = local[..., 2]
    u = intr[0, 0] * local[..., 0] / zc + intr[0, 2]
    v = intr[1, 1] * local[..., 1] / zc + intr[1, 2]
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    inside = (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h) & (zc > 0)
    ui_c = jnp.clip(ui, 0, w - 1)
    vi_c = jnp.clip(vi, 0, h - 1)
    d = depth[vi_c, ui_c]
    c = rgb[vi_c, ui_c]

    valid = inside & (d > 0) & (d <= depth_trunc)
    sdf = d - zc
    valid = valid & (sdf > -vol.sdf_trunc)
    tsdf_obs = jnp.minimum(sdf / vol.sdf_trunc, 1.0)

    w_old = vol.weight
    w_new = w_old + valid.astype(jnp.float32)
    w_safe = jnp.maximum(w_new, 1.0)
    tsdf = jnp.where(valid, (vol.tsdf * w_old + tsdf_obs) / w_safe, vol.tsdf)
    color = jnp.where(
        valid[..., None], (vol.color * w_old[..., None] + c) / w_safe[..., None], vol.color
    )
    return dataclasses.replace(vol, tsdf=tsdf, weight=w_new, color=color)


# Tetrahedral decomposition of a cube (corner ids 0..7 = (dx, dy, dz) bits
# x*4 + y*2 + z). Each cube splits into 6 tets sharing the main diagonal 0-7.
_CUBE_CORNERS = np.array(
    [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1], [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]]
)
_TETS = np.array(
    [
        [0, 5, 1, 7],
        [0, 1, 3, 7],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
        [0, 4, 5, 7],
    ]
)


def _tet_triangles(code):
    """Triangulation (as corner-pair edges) for a tet sign code (bit i = corner i
    inside). Returns list of triangles, each a list of 3 (a, b) edges."""
    cases = {
        0b0001: [[(0, 1), (0, 2), (0, 3)]],
        0b0010: [[(1, 0), (1, 3), (1, 2)]],
        0b0100: [[(2, 0), (2, 1), (2, 3)]],
        0b1000: [[(3, 0), (3, 2), (3, 1)]],
        0b0011: [[(0, 2), (1, 3), (0, 3)], [(0, 2), (1, 2), (1, 3)]],
        0b0101: [[(0, 1), (2, 3), (0, 3)], [(0, 1), (2, 1), (2, 3)]],
        0b1001: [[(0, 1), (0, 2), (3, 2)], [(0, 1), (3, 2), (3, 1)]],
        0b0110: [[(1, 0), (2, 3), (1, 3)], [(1, 0), (2, 0), (2, 3)]],
        0b1010: [[(1, 0), (1, 2), (3, 2)], [(3, 0), (1, 0), (3, 2)]],
        0b1100: [[(2, 0), (2, 1), (3, 1)], [(3, 0), (2, 0), (3, 1)]],
    }
    if code in cases:
        return cases[code], False
    inv = (~code) & 0xF
    if inv in cases:
        return cases[inv], True
    return [], False


# Precompute per-code edge triangles once.
_TET_CASES = {}
for _code in range(16):
    _tris, _flip = _tet_triangles(_code)
    _TET_CASES[_code] = (_tris, _flip)


def extract_mesh(vol: TSDFVolume, with_color: bool = True):
    """Marching tetrahedra over the dense volume -> (verts, faces, colors).

    A cube participates only if all 8 corners were observed (weight > 0), the
    o3d convention. Vertices on shared edges are merged by exact edge identity.
    """
    tsdf = np.asarray(vol.tsdf)
    weight = np.asarray(vol.weight)
    color = np.asarray(vol.color) if with_color else None
    origin = np.asarray(vol.origin)
    vs = vol.voxel_size
    X, Y, Z = tsdf.shape

    valid = weight > 0
    # cube validity: all 8 corners valid
    cv = valid[:-1, :-1, :-1]
    for dx, dy, dz in _CUBE_CORNERS[1:]:
        cv = cv & valid[dx : X - 1 + dx, dy : Y - 1 + dy, dz : Z - 1 + dz]
    # sign change presence (cheap cull)
    neg = tsdf < 0
    any_neg = np.zeros_like(cv)
    all_neg = np.ones_like(cv)
    for dx, dy, dz in _CUBE_CORNERS:
        s = neg[dx : X - 1 + dx, dy : Y - 1 + dy, dz : Z - 1 + dz]
        any_neg |= s
        all_neg &= s
    active = cv & any_neg & ~all_neg
    ci, cj, ck = np.nonzero(active)
    if len(ci) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32), np.zeros((0, 3), np.float32)

    base = np.stack([ci, cj, ck], axis=1)  # [C, 3]
    corner_idx = base[:, None, :] + _CUBE_CORNERS[None]  # [C, 8, 3]
    d = tsdf[corner_idx[..., 0], corner_idx[..., 1], corner_idx[..., 2]]  # [C, 8]

    # Global corner linear ids for vertex dedup via edge keys.
    lin = (corner_idx[..., 0] * Y + corner_idx[..., 1]) * Z + corner_idx[..., 2]  # [C, 8]

    tri_edge_a = []  # corner linear ids
    tri_edge_b = []
    for tet in _TETS:
        dt = d[:, tet]  # [C, 4]
        code = ((dt < 0) * (1 << np.arange(4))[None]).sum(axis=1)  # [C]
        for cval in range(1, 15):
            rows = np.nonzero(code == cval)[0]
            if len(rows) == 0:
                continue
            tris, flip = _TET_CASES[cval]
            for tri in tris:
                pairs = tri if not flip else tri[::-1]
                ea = [lin[rows, tet[a]] for a, b in pairs]
                eb = [lin[rows, tet[b]] for a, b in pairs]
                tri_edge_a.append(np.stack(ea, axis=1))  # [R, 3]
                tri_edge_b.append(np.stack(eb, axis=1))

    if not tri_edge_a:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32), np.zeros((0, 3), np.float32)

    ea = np.concatenate(tri_edge_a)  # [T, 3] corner id a (inside/outside end 1)
    eb = np.concatenate(tri_edge_b)
    # Unique undirected edge -> vertex
    lo = np.minimum(ea, eb).reshape(-1)
    hi = np.maximum(ea, eb).reshape(-1)
    key = lo.astype(np.int64) * (X * Y * Z) + hi
    uniq, inv = np.unique(key, return_inverse=True)
    faces = inv.reshape(-1, 3).astype(np.int32)

    ulo = (uniq // (X * Y * Z)).astype(np.int64)
    uhi = (uniq % (X * Y * Z)).astype(np.int64)

    def unravel(l):
        return np.stack([l // (Y * Z), (l // Z) % Y, l % Z], axis=1)

    ca = unravel(ulo)
    cb = unravel(uhi)
    da = tsdf[ca[:, 0], ca[:, 1], ca[:, 2]]
    db = tsdf[cb[:, 0], cb[:, 1], cb[:, 2]]
    t = np.clip(np.where(np.abs(da - db) < 1e-12, 0.5, da / (da - db)), 0.0, 1.0)
    verts = origin + (ca + t[:, None] * (cb - ca)) * vs

    vcol = np.zeros((len(verts), 3), np.float32)
    if with_color and color is not None:
        cola = color[ca[:, 0], ca[:, 1], ca[:, 2]]
        colb = color[cb[:, 0], cb[:, 1], cb[:, 2]]
        vcol = cola + t[:, None] * (colb - cola)

    # Drop degenerate faces (two identical vertex ids).
    good = (
        (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) & (faces[:, 0] != faces[:, 2])
    )
    faces = faces[good]

    # Consistent outward orientation: flip each face whose normal opposes the
    # local TSDF gradient (tsdf increases outward). This makes the winding
    # globally consistent independent of the per-tet case tables.
    grad = np.stack(np.gradient(tsdf), axis=-1)  # [X, Y, Z, 3]
    centroid = verts[faces].mean(axis=1)
    gi = np.clip(np.round((centroid - origin) / vs).astype(int), 0, np.array(tsdf.shape) - 1)
    g = grad[gi[:, 0], gi[:, 1], gi[:, 2]]
    fv = verts[faces]
    n = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    flip = (n * g).sum(-1) < 0
    faces[flip] = faces[flip][:, ::-1]

    return verts.astype(np.float32), faces, vcol.astype(np.float32)


def fit_volume_to_points(points, voxel_size: float, sdf_trunc: float, pad: float = 0.05, max_dim: int = 512) -> TSDFVolume:
    """Create a dense volume covering a point set with padding.

    Unlike o3d's ScalableTSDFVolume (refined_mesh.py:329) this volume is dense
    and bounded: if the padded bbox needs more than `max_dim` voxels along an
    axis, the volume is truncated and geometry outside it is silently lost by
    `integrate` — so we warn loudly and record `.truncated` on the volume.
    """
    import warnings

    points = np.asarray(points)
    lo = points.min(axis=0) - pad
    hi = points.max(axis=0) + pad
    needed = np.ceil((hi - lo) / voxel_size).astype(int) + 1
    # Bucket dims up to a multiple of 16: the extra voxels are never observed
    # (weight stays 0, excluded from extraction), and STABLE dims mean the
    # fusion program's shapes survive the mm-scale point drift between an
    # AOT prewarm mid-refine (mesh_update.prewarm_fusion) and the real fusion
    # call after training — so the ~170 s tunnel compile can hide under the
    # training wall instead of recompiling for a one-voxel bbox change.
    needed = (needed + 15) // 16 * 16
    dims = np.minimum(needed, max_dim)
    truncated = bool((needed > max_dim).any())
    if truncated:
        warnings.warn(
            f"fit_volume_to_points: bbox needs dims {needed.tolist()} voxels at "
            f"voxel_size={voxel_size}, clamped to max_dim={max_dim}; geometry "
            f"outside {(max_dim * voxel_size):.3f} m per axis will be lost. "
            f"Raise max_dim or voxel_size.",
            stacklevel=2,
        )
    vol = make_volume(lo, tuple(int(d) for d in dims), voxel_size, sdf_trunc)
    vol.truncated = truncated
    return vol
