"""Image and mesh losses.

Numerical parity targets:
  - l1/l2/ssim: /root/reference/gaustar_utils/loss_utils.py:17-63 (SSIM with an 11x11
    Gaussian window, sigma 1.5, zero padding, C1=0.01^2, C2=0.03^2).
  - mesh regularizers: pytorch3d's mesh_normal_consistency and the edge/area isometry
    terms assembled in /root/reference/gaustar_trainers/refine.py:678-718.

Images here are channel-last [..., H, W, C] (TPU-friendly); the reference is CHW.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gaustar_tpu.utils.general import l2norm


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - gt).mean()


def l2_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return ((pred - gt) ** 2).mean()


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    x = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma**2))
    g = (g / g.sum()).astype(np.float32)
    return np.outer(g, g)


def _rank1_factors(window: np.ndarray):
    """(kcol, krow) if the window is rank-1 (SSIM's is outer(g, g)), else None.
    Host-side: windows come from _gaussian_window constants."""
    u, s, vt = np.linalg.svd(np.asarray(window, np.float32))
    if s[1:].max(initial=0.0) < 1e-6 * s[0]:
        kcol = (u[:, 0] * np.sqrt(s[0])).astype(np.float32)
        krow = (vt[0] * np.sqrt(s[0])).astype(np.float32)
        return kcol, krow
    return None


def _sep_filter_bhw(x: jnp.ndarray, kcol: np.ndarray, krow: np.ndarray) -> jnp.ndarray:
    """Separable zero-'same' filter over [B, H, W] as static shift-and-add.

    Channels/fields ride the leading batch dim so W stays the TPU lane
    dimension; the k static slices fuse into one vector pass. The NHWC
    depthwise-conv form (C=3 in lanes, feature_group_count=3) lowers to ~3%
    lane utilization and cost ~26 ms/step at 1.6 MP; this form is ~1 ms."""
    h, w = len(kcol), len(krow)
    H, W = x.shape[-2], x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (h // 2, h // 2), (0, 0)))
    x = sum(float(kcol[k]) * xp[:, k : k + H, :] for k in range(h))
    xp = jnp.pad(x, ((0, 0), (0, 0), (w // 2, w // 2)))
    return sum(float(krow[k]) * xp[:, :, k : k + W] for k in range(w))


def _filter2d_same(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 2D conv with zero 'same' padding. img: [H, W, C].

    Rank-1 windows (SSIM's Gaussian) run as two separable shift-and-add passes
    in channels-major layout; non-separable windows fall back to the dense
    depthwise conv."""
    h, w = window.shape
    c = img.shape[-1]
    fac = _rank1_factors(window)
    if fac is not None:
        kcol, krow = fac
        out = _sep_filter_bhw(img.transpose(2, 0, 1), kcol, krow)
        return out.transpose(1, 2, 0)
    kernel = jnp.broadcast_to(jnp.asarray(window)[:, :, None, None], (h, w, 1, c))
    out = jax.lax.conv_general_dilated(
        img[None],
        kernel,
        window_strides=(1, 1),
        padding=((h // 2, h // 2), (w // 2, w // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out[0]


def ssim_map(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Per-pixel SSIM map over an [H, W, C] pair (reference loss_utils.py:33-63).

    The five filtered fields (mu1, mu2, E[x^2], E[y^2], E[xy]) are stacked into
    one [5C, H, W] batch so the separable window runs as a single fused
    shift-and-add pass (see _sep_filter_bhw)."""
    window = _gaussian_window(window_size, 1.5)
    fac = _rank1_factors(window)
    if fac is None:  # non-separable: per-field depthwise conv fallback
        mu1 = _filter2d_same(img1, window)
        mu2 = _filter2d_same(img2, window)
        f = lambda x: _filter2d_same(x, window)
        e11, e22, e12 = f(img1 * img1), f(img2 * img2), f(img1 * img2)
    else:
        c = img1.shape[-1]
        stack = jnp.concatenate(
            [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=-1
        ).transpose(2, 0, 1)  # [5C, H, W]
        out = _sep_filter_bhw(stack, *fac).transpose(1, 2, 0)
        mu1, mu2 = out[..., 0:c], out[..., c : 2 * c]
        e11, e22, e12 = out[..., 2 * c : 3 * c], out[..., 3 * c : 4 * c], out[..., 4 * c :]
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = e11 - mu1_sq
    sigma2_sq = e22 - mu2_sq
    sigma12 = e12 - mu1_mu2
    c1 = 0.01**2
    c2 = 0.03**2
    return ((2.0 * mu1_mu2 + c1) * (2.0 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )


def ssim_map_cm(img1_cm: jnp.ndarray, img2_cm: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """ssim_map in CHANNELS-MAJOR layout ([C, H, W] in -> [C, H, W] map): the
    separable filter already runs channels-major (_sep_filter_bhw), so this
    path has NO [H,W,C] relayouts — the Pallas render's native layout flows
    straight through (two big transposes + their backward counterparts saved
    per step vs ssim_map)."""
    window = _gaussian_window(window_size, 1.5)
    fac = _rank1_factors(window)
    assert fac is not None, "cm path expects the separable SSIM window"
    c = img1_cm.shape[0]
    stack = jnp.concatenate(
        [img1_cm, img2_cm, img1_cm * img1_cm, img2_cm * img2_cm, img1_cm * img2_cm],
        axis=0,
    )  # [5C, H, W]
    out = _sep_filter_bhw(stack, *fac)
    mu1, mu2 = out[0:c], out[c : 2 * c]
    e11, e22, e12 = out[2 * c : 3 * c], out[3 * c : 4 * c], out[4 * c :]
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = e11 - mu1_sq
    sigma2_sq = e22 - mu2_sq
    sigma12 = e12 - mu1_mu2
    c1 = 0.01**2
    c2 = 0.03**2
    return ((2.0 * mu1_mu2 + c1) * (2.0 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM over an [H, W, C] image pair (reference loss_utils.py:33-63)."""
    return ssim_map(img1, img2, window_size).mean()


def rgb_loss(pred: jnp.ndarray, gt: jnp.ndarray, dssim_factor: float = 0.2) -> jnp.ndarray:
    """0.8*L1 + 0.2*DSSIM — the reference's loss_fn (refine.py:107-109, 446-453)."""
    return (1.0 - dssim_factor) * l1_loss(pred, gt) + dssim_factor * (1.0 - ssim(pred, gt))


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    mse = ((pred - gt) ** 2).mean()
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


# ---------------------------------------------------------------------------
# Mesh regularizers (pytorch3d-free TPU equivalents).
# ---------------------------------------------------------------------------


def _face_corner_comps(verts: jnp.ndarray, faces: jnp.ndarray, tables=None):
    """Face corner coordinates as component arrays v[k][d] of shape [F]: one row
    gather + slices, keeping downstream math on full-lane [F] vectors instead of
    [F, 3, 3] broadcasts whose minor dims pad into (8, 128) vector tiles.
    `tables` (ops/segment.gather_tables) swaps the gather's scatter-add VJP for
    a static segment-sum (~2x faster backward at reference scale)."""
    from gaustar_tpu.ops.segment import gather_rows

    f = faces.shape[0]
    fv = gather_rows(verts, faces.reshape(-1), tables).reshape(f, 3, 3)
    return [[fv[:, k, d] for d in range(3)] for k in range(3)]


def _cross_comps(a, b):
    return [
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ]


def _area_normal_from_comps(v):
    """(areas [F], normal components [nx, ny, nz] each [F]) from corner comps."""
    e1 = [v[1][d] - v[0][d] for d in range(3)]
    e2 = [v[2][d] - v[0][d] for d in range(3)]
    n = _cross_comps(e1, e2)
    # Clamp INSIDE the sqrt: sqrt'(0) = inf and the area cotangent is nonzero
    # (area-iso loss), so an exactly-degenerate face would otherwise NaN every
    # gradient. See utils.general.l2norm.
    nn = jnp.sqrt(jnp.maximum(n[0] * n[0] + n[1] * n[1] + n[2] * n[2], 1e-24))
    inv = 1.0 / nn
    return 0.5 * nn, [n[d] * inv for d in range(3)]


def _face_area_normal_comps(verts, faces, tables=None):
    """(areas [F], normal components [nx, ny, nz] each [F]) — component-major."""
    return _area_normal_from_comps(_face_corner_comps(verts, faces, tables))


def face_areas_normals(verts: jnp.ndarray, faces: jnp.ndarray):
    """Per-face areas [F] and unit normals [F, 3]."""
    areas, n = _face_area_normal_comps(verts, faces)
    return areas, jnp.stack(n, axis=-1)


def edge_lengths(verts: jnp.ndarray, edges: jnp.ndarray) -> jnp.ndarray:
    ev = verts[edges.reshape(-1)].reshape(-1, 2, 3)
    d = [ev[:, 0, k] - ev[:, 1, k] for k in range(3)]
    return jnp.sqrt(jnp.maximum(d[0] * d[0] + d[1] * d[1] + d[2] * d[2], 1e-24))


def mesh_edge_isometry_loss(verts, edges, ref_lengths) -> jnp.ndarray:
    """(edge_len - ref_len)^2 mean — refine.py:690-698 edge-iso term."""
    return ((edge_lengths(verts, edges) - ref_lengths) ** 2).mean()


def face_edge_tables(faces: np.ndarray, edges: np.ndarray, ref_lengths: np.ndarray):
    """Host-side tables for mesh_edge_isometry_loss_faces: per face corner k,
    the edge (faces[:, k], faces[:, (k+1)%3])'s reference length [F, 3] and a
    weight [F, 3] = 1 / (E * multiplicity) such that the weighted sum over all
    face edges equals the MEAN over unique edges (interior edges appear in two
    faces, boundary edges in one)."""
    faces = np.asarray(faces)
    edges = np.asarray(edges)
    nv = int(max(faces.max(), edges.max())) + 1
    fe_a = faces
    fe_b = faces[:, [1, 2, 0]]
    fe_key = np.minimum(fe_a, fe_b).astype(np.int64) * nv + np.maximum(fe_a, fe_b)
    e_key = np.minimum(edges[:, 0], edges[:, 1]).astype(np.int64) * nv + np.maximum(
        edges[:, 0], edges[:, 1]
    )
    order = np.argsort(e_key)
    pos = np.searchsorted(e_key[order], fe_key.reshape(-1))
    edge_id = order[pos].reshape(faces.shape)
    assert (e_key[edge_id] == fe_key).all(), "face edge not found in edge list"
    mult = np.bincount(edge_id.reshape(-1), minlength=len(edges))
    w = (1.0 / (mult[edge_id] * float(len(edges)))).astype(np.float32)
    ref = np.asarray(ref_lengths, np.float32)[edge_id]
    return ref, w


def mesh_edge_isometry_loss_faces(
    verts, faces, face_edge_ref, face_edge_w, tables=None
) -> jnp.ndarray:
    """Edge-iso computed from the FACE corner gather instead of a separate
    verts[edges] gather: sum_k w[:, k] * (|v_k - v_{k+1}| - ref[:, k])^2, with
    tables from face_edge_tables — numerically equal to
    mesh_edge_isometry_loss (each unique edge counted once via the weights),
    but its gradient rides the SAME verts[faces] gather the normal-consistency
    and area losses use, so the backward has one shared vertex scatter instead
    of two (the gather's transpose adds the cotangents before scattering)."""
    return _edge_iso_from_comps(
        _face_corner_comps(verts, faces, tables), face_edge_ref, face_edge_w
    )


def _edge_iso_from_comps(v, face_edge_ref, face_edge_w) -> jnp.ndarray:
    total = jnp.float32(0.0)
    for k in range(3):
        k2 = (k + 1) % 3
        d = [v[k][dd] - v[k2][dd] for dd in range(3)]
        ln = jnp.sqrt(jnp.maximum(d[0] * d[0] + d[1] * d[1] + d[2] * d[2], 1e-24))
        total = total + (face_edge_w[:, k] * (ln - face_edge_ref[:, k]) ** 2).sum()
    return total


def mesh_regularizers(
    verts,
    faces,
    adj_faces,
    ref_area,
    face_edge_ref=None,
    face_edge_w=None,
    edges=None,
    ref_edge_len=None,
    tables=None,
    adj_tables=None,
    face_mask=None,
    adj_mask=None,
):
    """All three mesh losses (refine.py:678-718) from ONE verts[faces] gather.

    Calling the per-loss functions separately shares the forward gather via
    XLA CSE, but each call's VJP still runs its OWN per-vertex backward
    reduction (~1.3 ms per 300k-row descriptor-bound gather; the round-4
    xplane trace showed seven of them). Sharing the gathered VALUE makes
    autodiff sum the three losses' cotangents first — one backward reduction.
    Returns {'nc', 'edge', 'area'} (edge = 0 if no edge tables given).

    `face_mask` [F] / `adj_mask` [E_int] (0/1 floats) support face-count
    BUCKETING (train/bucketing.py): padded degenerate faces/adjacency rows
    contribute exactly zero and the means normalize by the REAL counts (the
    mask sums), so a padded mesh produces the identical loss value as the
    unpadded one. The degenerate-face area/normal math is already NaN-safe
    (_area_normal_from_comps clamps inside the sqrt); the edge-iso face tables
    carry explicit weights, so padded faces just get weight 0."""
    from gaustar_tpu.ops.segment import gather_rows

    v = _face_corner_comps(verts, faces, tables)
    areas, n = _area_normal_from_comps(v)
    normals = jnp.stack(n, axis=-1)
    nv = gather_rows(normals, adj_faces.reshape(-1), adj_tables).reshape(-1, 2, 3)
    dot = sum(nv[:, 0, d] * nv[:, 1, d] for d in range(3))
    if adj_mask is not None:
        nc = ((1.0 - dot) * adj_mask).sum() / jnp.maximum(adj_mask.sum(), 1.0)
    else:
        nc = (1.0 - dot).mean()
    if face_edge_ref is not None:
        edge = _edge_iso_from_comps(v, face_edge_ref, face_edge_w)
    elif edges is not None:
        edge = mesh_edge_isometry_loss(verts, edges, ref_edge_len)
    else:
        edge = jnp.float32(0.0)
    if face_mask is not None:
        area = (jnp.abs(areas - ref_area) * face_mask).sum() / jnp.maximum(
            face_mask.sum(), 1.0
        )
    else:
        area = jnp.abs(areas - ref_area).mean()
    return {"nc": nc, "edge": edge, "area": area}


def mesh_area_isometry_loss(verts, faces, ref_areas, tables=None) -> jnp.ndarray:
    """|face_area - ref_area| mean — refine.py:700-706 area-iso term."""
    areas, _ = _face_area_normal_comps(verts, faces, tables)
    return jnp.abs(areas - ref_areas).mean()


def mesh_laplacian_smoothing_loss(verts: jnp.ndarray, edges: jnp.ndarray) -> jnp.ndarray:
    """Uniform-Laplacian smoothing: mean over vertices of ||mean(neighbors) - v||.

    The reference's (default-off) surface_mesh_laplacian_smoothing_loss with
    method="uniform" (refine.py:117-122, 680-682; pytorch3d
    mesh_laplacian_smoothing). Vertex adjacency comes from the undirected edge
    list; isolated vertices contribute 0."""
    n = verts.shape[0]
    src = jnp.concatenate([edges[:, 0], edges[:, 1]])
    dst = jnp.concatenate([edges[:, 1], edges[:, 0]])
    nb_sum = jax.ops.segment_sum(verts[dst], src, num_segments=n)
    deg = jax.ops.segment_sum(jnp.ones_like(src, dtype=verts.dtype), src, num_segments=n)
    safe_deg = jnp.maximum(deg, 1.0)[:, None]
    lap = nb_sum / safe_deg - verts
    lap = jnp.where((deg > 0)[:, None], lap, 0.0)
    # eps: a vertex at its neighbors' centroid has lap == 0 exactly; the
    # unclamped sqrt VJP would be NaN there (see utils.general.l2norm).
    return l2norm(lap, keepdims=False, eps=1e-12).mean()


def mesh_area_reg_loss(verts, faces) -> jnp.ndarray:
    """relu(mean_area / face_area - 2).mean() with a stop-gradient mean — the
    reference's (default-off) area_reg loss penalizing faces that shrink below
    half the average area (refine.py:143-144, 713-718)."""
    areas, _ = face_areas_normals(verts, faces)
    mean_area = jax.lax.stop_gradient(areas.mean())
    return jax.nn.relu(mean_area / jnp.maximum(areas, 1e-12) - 2.0).mean()


def mesh_normal_consistency_loss(
    verts, faces, adj_faces: jnp.ndarray, tables=None, adj_tables=None
) -> jnp.ndarray:
    """Mean (1 - cos) between normals of face pairs sharing an edge.

    `adj_faces` is a static [E_int, 2] int array of face index pairs adjacent across
    interior edges (precomputed on host from the mesh connectivity). pytorch3d's
    mesh_normal_consistency builds per-edge cross products from the vertex-opposite
    construction (n0 = (v1-v0)x(a-v0), n1 = (v1-v0)x(b-v0), 1 - cos(n0, -n1)); on a
    consistently wound manifold mesh that cosine equals the cosine between the two
    FACE normals, so this face-normal form is numerically identical (not merely
    same-stationary-point) — verified in tests/test_losses.py
    test_normal_consistency_matches_pytorch3d_form.
    """
    from gaustar_tpu.ops.segment import gather_rows

    _, n = _face_area_normal_comps(verts, faces, tables)
    normals = jnp.stack(n, axis=-1)  # [F, 3] — ONE row gather below, then slices
    nv = gather_rows(normals, adj_faces.reshape(-1), adj_tables).reshape(-1, 2, 3)
    dot = sum(nv[:, 0, d] * nv[:, 1, d] for d in range(3))
    return (1.0 - dot).mean()
