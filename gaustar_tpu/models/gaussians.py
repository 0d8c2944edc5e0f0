"""Vanilla 3DGS GaussianModel as a pytree (reference layer L1,
gaussian_splatting/scene/gaussian_model.py:24-256).

Activations match the reference exactly: scaling = exp(log-scales), opacity =
sigmoid(logits), rotation = normalized w-first quaternion; SH features split into
dc [N, 1, 3] and rest [N, K-1, 3]. PLY layout round-trips reference checkpoints
(save_ply/load_ply, gaussian_model.py:191-256).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gaustar_tpu.cameras import Camera
from gaustar_tpu.io import ply
from gaustar_tpu.ops import sh as sh_ops
from gaustar_tpu.ops.knn import dist2_avg3
from gaustar_tpu.ops.projection import quat_scale_to_cov3d
from gaustar_tpu.ops.rasterizer import RasterConfig, rasterize
from gaustar_tpu.utils.general import inverse_sigmoid, normalize


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianParams:
    xyz: Any  # [N, 3]
    features_dc: Any  # [N, 1, 3]
    features_rest: Any  # [N, K-1, 3]
    scaling: Any  # [N, 3] log-scales
    rotation: Any  # [N, 4] raw quats (normalized at use)
    opacity: Any  # [N, 1] logits


def n_points(p: GaussianParams) -> int:
    return p.xyz.shape[0]


def get_scaling(p: GaussianParams) -> jnp.ndarray:
    return jnp.exp(p.scaling)


def get_rotation(p: GaussianParams) -> jnp.ndarray:
    return normalize(p.rotation)


def get_opacity(p: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(p.opacity)


def get_features(p: GaussianParams) -> jnp.ndarray:
    return jnp.concatenate([p.features_dc, p.features_rest], axis=1)  # [N, K, 3]


def create_from_pcd(points: np.ndarray, colors: np.ndarray, sh_degree: int = 2) -> GaussianParams:
    """Initialize from a colored point cloud (gaussian_model.py:121-144):
    scales = log(sqrt(mean sq dist to 3-NN)) isotropic, opacity 0.1, identity rot."""
    n = len(points)
    k = (sh_degree + 1) ** 2
    dist2 = jnp.clip(dist2_avg3(jnp.asarray(points, jnp.float32)), 1e-7, None)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
    rots = np.zeros((n, 4), np.float32)
    rots[:, 0] = 1.0
    return GaussianParams(
        xyz=jnp.asarray(points, jnp.float32),
        features_dc=jnp.asarray(sh_ops.rgb_to_sh(np.asarray(colors, np.float32)))[:, None, :],
        features_rest=jnp.zeros((n, k - 1, 3), jnp.float32),
        scaling=scales,
        rotation=jnp.asarray(rots),
        opacity=jnp.asarray(inverse_sigmoid(0.1 * np.ones((n, 1), np.float32))),
    )


def render(
    p: GaussianParams,
    camera: Camera,
    bg=(0.0, 0.0, 0.0),
    sh_deg: int | None = None,
    raster_config: RasterConfig = RasterConfig(),
    means2d_dummy: jnp.ndarray | None = None,
):
    """Render (gaussian_renderer/__init__.py:18-113 equivalent, SH in python)."""
    feats = get_features(p)
    if sh_deg is None:
        sh_deg = int(np.sqrt(feats.shape[1])) - 1
    colors = sh_ops.sh_to_rgb(sh_deg, feats[:, : (sh_deg + 1) ** 2], p.xyz, camera.camera_center)
    cov = quat_scale_to_cov3d(get_scaling(p), get_rotation(p))
    return rasterize(
        p.xyz,
        cov,
        get_opacity(p).reshape(-1),
        colors,
        camera,
        bg=bg,
        config=raster_config,
        means2d_dummy=means2d_dummy,
    )


# ---------------------------------------------------------------------------
# 3DGS .ply checkpoint format (gaussian_model.py:191-256)
# ---------------------------------------------------------------------------


def save_ply(p: GaussianParams, path: str):
    xyz = np.asarray(p.xyz)
    n = len(xyz)
    f_dc = np.asarray(p.features_dc).transpose(0, 2, 1).reshape(n, -1)  # channel-major
    f_rest = np.asarray(p.features_rest).transpose(0, 2, 1).reshape(n, -1)
    props = {"x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2]}
    for a, name in zip(np.zeros((3, n), np.float32), ["nx", "ny", "nz"]):
        props[name] = a
    for i in range(f_dc.shape[1]):
        props[f"f_dc_{i}"] = f_dc[:, i]
    for i in range(f_rest.shape[1]):
        props[f"f_rest_{i}"] = f_rest[:, i]
    props["opacity"] = np.asarray(p.opacity)[:, 0]
    sc = np.asarray(p.scaling)
    for i in range(3):
        props[f"scale_{i}"] = sc[:, i]
    rot = np.asarray(p.rotation)
    for i in range(4):
        props[f"rot_{i}"] = rot[:, i]
    ply.write_ply(path, props)


def load_ply(path: str) -> GaussianParams:
    v = ply.read_ply(path)["vertex"]
    n = len(v["x"])
    xyz = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float32)
    f_dc = np.stack([v[f"f_dc_{i}"] for i in range(3)], axis=1).astype(np.float32)  # [N, 3]
    rest_names = sorted(
        (k for k in v if k.startswith("f_rest_")), key=lambda s: int(s.split("_")[-1])
    )
    if rest_names:
        f_rest = np.stack([v[k] for k in rest_names], axis=1).astype(np.float32)
        km1 = len(rest_names) // 3
        f_rest = f_rest.reshape(n, 3, km1).transpose(0, 2, 1)
    else:
        f_rest = np.zeros((n, 0, 3), np.float32)
    scaling = np.stack([v[f"scale_{i}"] for i in range(3)], axis=1).astype(np.float32)
    rotation = np.stack([v[f"rot_{i}"] for i in range(4)], axis=1).astype(np.float32)
    return GaussianParams(
        xyz=jnp.asarray(xyz),
        features_dc=jnp.asarray(f_dc)[:, None, :],
        features_rest=jnp.asarray(f_rest),
        scaling=jnp.asarray(scaling),
        rotation=jnp.asarray(rotation),
        opacity=jnp.asarray(v["opacity"].astype(np.float32))[:, None],
    )
