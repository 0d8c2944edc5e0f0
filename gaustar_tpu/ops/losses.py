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


def _filter2d_same(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 2D conv with zero 'same' padding. img: [H, W, C].

    The SSIM Gaussian window is rank-1 (outer(g, g)), so the conv runs as two
    separable 1D passes — k+k MACs/pixel instead of k*k (5.5x fewer at k=11;
    the 2D form costs ~2 GFLOP/call at 1.6 MP and shows up in the step time).
    Non-separable windows fall back to the dense depthwise conv."""
    h, w = window.shape
    c = img.shape[-1]
    win = np.asarray(window, np.float32)
    # Rank-1 check on the HOST constant (windows come from _gaussian_window).
    u, s, vt = np.linalg.svd(win)
    if s[1:].max(initial=0.0) < 1e-6 * s[0]:
        kcol = (u[:, 0] * np.sqrt(s[0])).astype(np.float32)  # [h]
        krow = (vt[0] * np.sqrt(s[0])).astype(np.float32)  # [w]
        kv = jnp.broadcast_to(jnp.asarray(kcol)[:, None, None, None], (h, 1, 1, c))
        kh = jnp.broadcast_to(jnp.asarray(krow)[None, :, None, None], (1, w, 1, c))
        out = jax.lax.conv_general_dilated(
            img[None], kv, (1, 1), ((h // 2, h // 2), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )
        out = jax.lax.conv_general_dilated(
            out, kh, (1, 1), ((0, 0), (w // 2, w // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )
        return out[0]
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


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM over an [H, W, C] image pair (reference loss_utils.py:33-63)."""
    window = _gaussian_window(window_size, 1.5)
    mu1 = _filter2d_same(img1, window)
    mu2 = _filter2d_same(img2, window)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _filter2d_same(img1 * img1, window) - mu1_sq
    sigma2_sq = _filter2d_same(img2 * img2, window) - mu2_sq
    sigma12 = _filter2d_same(img1 * img2, window) - mu1_mu2
    c1 = 0.01**2
    c2 = 0.03**2
    ssim_map = ((2.0 * mu1_mu2 + c1) * (2.0 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean()


def rgb_loss(pred: jnp.ndarray, gt: jnp.ndarray, dssim_factor: float = 0.2) -> jnp.ndarray:
    """0.8*L1 + 0.2*DSSIM — the reference's loss_fn (refine.py:107-109, 446-453)."""
    return (1.0 - dssim_factor) * l1_loss(pred, gt) + dssim_factor * (1.0 - ssim(pred, gt))


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    mse = ((pred - gt) ** 2).mean()
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


# ---------------------------------------------------------------------------
# Mesh regularizers (pytorch3d-free TPU equivalents).
# ---------------------------------------------------------------------------


def face_areas_normals(verts: jnp.ndarray, faces: jnp.ndarray):
    """Per-face areas [F] and unit normals [F, 3]."""
    v = verts[faces]  # [F, 3, 3]
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    n = jnp.cross(e1, e2)
    nn = l2norm(n)
    areas = 0.5 * nn[..., 0]
    normals = n / jnp.maximum(nn, 1e-12)
    return areas, normals


def edge_lengths(verts: jnp.ndarray, edges: jnp.ndarray) -> jnp.ndarray:
    d = verts[edges[:, 0]] - verts[edges[:, 1]]
    return l2norm(d, keepdims=False)


def mesh_edge_isometry_loss(verts, edges, ref_lengths) -> jnp.ndarray:
    """(edge_len - ref_len)^2 mean — refine.py:690-698 edge-iso term."""
    return ((edge_lengths(verts, edges) - ref_lengths) ** 2).mean()


def mesh_area_isometry_loss(verts, faces, ref_areas) -> jnp.ndarray:
    """|face_area - ref_area| mean — refine.py:700-706 area-iso term."""
    areas, _ = face_areas_normals(verts, faces)
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
    return l2norm(lap, keepdims=False).mean()


def mesh_area_reg_loss(verts, faces) -> jnp.ndarray:
    """relu(mean_area / face_area - 2).mean() with a stop-gradient mean — the
    reference's (default-off) area_reg loss penalizing faces that shrink below
    half the average area (refine.py:143-144, 713-718)."""
    areas, _ = face_areas_normals(verts, faces)
    mean_area = jax.lax.stop_gradient(areas.mean())
    return jax.nn.relu(mean_area / jnp.maximum(areas, 1e-12) - 2.0).mean()


def mesh_normal_consistency_loss(verts, faces, adj_faces: jnp.ndarray) -> jnp.ndarray:
    """Mean (1 - cos) between normals of face pairs sharing an edge.

    `adj_faces` is a static [E_int, 2] int array of face index pairs adjacent across
    interior edges (precomputed on host from the mesh connectivity). pytorch3d's
    mesh_normal_consistency uses (1 - cosine) between *vertex-opposite* edge vectors,
    which equals (1 - cos(normal angle)) up to the same stationary points; we use the
    face-normal form, which is the standard TPU-friendly formulation.
    """
    _, normals = face_areas_normals(verts, faces)
    n0 = normals[adj_faces[:, 0]]
    n1 = normals[adj_faces[:, 1]]
    return (1.0 - (n0 * n1).sum(-1)).mean()
