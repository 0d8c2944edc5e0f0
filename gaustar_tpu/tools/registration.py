"""Rigid registration + scene-editing helpers.

Covers the algorithmic pieces of internal_use_tools/gstar_edit.py (scene
cut/merge/editing support): Kabsch best-fit rigid transform (gstar_edit.py:28
best_fit_transform), nearest-neighbor ICP, and SuGaR model editing (cut by box,
rigid transform, recolor) — composed with models/compositor.py for merged-scene
rendering.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from gaustar_tpu.models import sugar


def best_fit_transform(A: np.ndarray, B: np.ndarray):
    """Least-squares rigid transform mapping A -> B (Kabsch). Returns (T 4x4, R, t)."""
    assert A.shape == B.shape
    ca = A.mean(axis=0)
    cb = B.mean(axis=0)
    H = (A - ca).T @ (B - cb)
    U, _, Vt = np.linalg.svd(H)
    R = Vt.T @ U.T
    if np.linalg.det(R) < 0:
        Vt[-1] *= -1
        R = Vt.T @ U.T
    t = cb - R @ ca
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T, R, t


def icp(src: np.ndarray, dst: np.ndarray, max_iterations: int = 20, tolerance: float = 1e-7):
    """Point-to-point ICP: returns (T 4x4, rms_history)."""
    from scipy.spatial import cKDTree

    cur = src.copy()
    T_total = np.eye(4)
    tree = cKDTree(dst)
    prev_err = np.inf
    history = []
    for _ in range(max_iterations):
        d, idx = tree.query(cur)
        T, R, t = best_fit_transform(cur, dst[idx])
        cur = cur @ R.T + t
        T_total = T @ T_total
        err = float(np.sqrt((d**2).mean()))
        history.append(err)
        if abs(prev_err - err) < tolerance:
            break
        prev_err = err
    return T_total, history


# ---------------------------------------------------------------------------
# SuGaR scene editing (gstar_edit capabilities)
# ---------------------------------------------------------------------------


def gaussian_mask_in_box(params, config, bb) -> jnp.ndarray:
    """[N] mask of gaussians whose centers lie inside the AABB [2, 3]."""
    centers = sugar.gaussian_centers(params, config)
    lo = jnp.asarray(bb[0])
    hi = jnp.asarray(bb[1])
    return ((centers > lo) & (centers < hi)).all(axis=-1)


def cut_model_by_box(params, config, bb, keep_inside=True):
    """Cut a SuGaR model by an AABB at FACE granularity (keeps mesh binding
    consistent). Returns (params, config) over the kept faces."""
    centers = np.asarray(sugar.gaussian_centers(params, config))
    ng = config.n_gaussians_per_face
    face_centers = centers.reshape(-1, ng, 3).mean(axis=1)
    inside = ((face_centers > np.asarray(bb[0])) & (face_centers < np.asarray(bb[1]))).all(-1)
    keep_faces = inside if keep_inside else ~inside
    return select_faces(params, config, keep_faces)


def select_faces(params, config, face_mask: np.ndarray):
    """Subset a SuGaR model to the given faces (re-indexing vertices)."""
    faces = np.asarray(config.faces)[face_mask]
    used = np.unique(faces)
    remap = np.full(int(np.asarray(config.faces).max()) + 1, -1, np.int64)
    remap[used] = np.arange(len(used))
    new_faces = remap[faces]
    ng = config.n_gaussians_per_face
    gmask = np.repeat(face_mask, ng)

    new_params = sugar.SuGaRParams(
        points=jnp.asarray(np.asarray(params.points)[used]),
        scales=params.scales[gmask],
        complex2d=params.complex2d[gmask],
        densities=params.densities[gmask],
        sh_dc=params.sh_dc[gmask],
        sh_rest=params.sh_rest[gmask],
        delta_t=params.delta_t[gmask],
        delta_r=params.delta_r[gmask],
    )
    new_config = dataclasses.replace(config, faces=jnp.asarray(new_faces.astype(np.int32)))
    return new_params, new_config


def transform_model(params, config, T: np.ndarray):
    """Apply a rigid transform to a SuGaR model's vertices (and delta_t)."""
    R = jnp.asarray(T[:3, :3], jnp.float32)
    t = jnp.asarray(T[:3, 3], jnp.float32)
    return dataclasses.replace(
        params,
        points=params.points @ R.T + t,
        delta_t=params.delta_t @ R.T,
    )


def recolor_model(params, factor=(1.0, 1.0, 1.0), offset=(0.0, 0.0, 0.0)):
    """Linear color edit in RGB space applied through the SH dc (gstar_edit.py:295)."""
    from gaustar_tpu.ops.sh import rgb_to_sh, sh_to_rgb_dc

    rgb = sh_to_rgb_dc(params.sh_dc)
    rgb = rgb * jnp.asarray(factor) + jnp.asarray(offset)
    return dataclasses.replace(params, sh_dc=rgb_to_sh(rgb))
