"""Scene composition: render several SuGaR models in one rasterization pass.

Equivalent of gaustar_scene/sugar_compositor.py:12-244 (multi-model
concat-and-rasterize used by the scene-editing tools) plus the rigid-transform
support of internal_use_tools/gstar_edit.py: each entry may carry a per-model
4x4 transform and a gaussian mask.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp

from gaustar_tpu.cameras import Camera
from gaustar_tpu.models import sugar
from gaustar_tpu.ops.rasterizer import RasterConfig, rasterize


@dataclasses.dataclass
class CompositorEntry:
    params: sugar.SuGaRParams
    config: sugar.SuGaRConfig
    transform: jnp.ndarray | None = None  # [4, 4] rigid transform (world -> world)
    mask: jnp.ndarray | None = None  # [N] bool gaussian selection
    color_scale: float = 1.0


def _transformed_gaussians(entry: CompositorEntry, camera: Camera, sh_deg: int):
    positions = sugar.gaussian_centers(entry.params, entry.config)
    U = sugar.gaussian_frames(entry.params, entry.config)
    s = sugar.scaling(entry.params, entry.config)
    opac = sugar.strengths(entry.params)

    if entry.transform is not None:
        R = entry.transform[:3, :3]
        t = entry.transform[:3, 3]
        positions = positions @ R.T + t
        U = R[None] @ U

    colors = sugar.points_rgb(entry.params, positions, camera.camera_center, sh_deg)
    colors = colors * entry.color_scale

    s2 = s**2
    M = U * s2[:, None, :]
    S = M @ U.transpose(0, 2, 1)
    cov = jnp.stack(
        [S[:, 0, 0], S[:, 0, 1], S[:, 0, 2], S[:, 1, 1], S[:, 1, 2], S[:, 2, 2]], axis=-1
    )
    if entry.mask is not None:
        opac = jnp.where(entry.mask, opac, 0.0)
    return positions, cov, opac, colors


def render_composite(
    entries: Sequence[CompositorEntry],
    camera: Camera,
    bg=(0.0, 0.0, 0.0),
    sh_deg: int = 2,
    raster_config: RasterConfig = RasterConfig(),
):
    """Concatenate all (selected, transformed) gaussians and rasterize once —
    the compositor's render_image_gaussian_rasterizer (sugar_compositor.py:29-244)."""
    parts = [_transformed_gaussians(e, camera, sh_deg) for e in entries]
    positions = jnp.concatenate([p[0] for p in parts])
    cov = jnp.concatenate([p[1] for p in parts])
    opac = jnp.concatenate([p[2] for p in parts])
    colors = jnp.concatenate([p[3] for p in parts])
    return rasterize(positions, cov, opac, colors, camera, bg=bg, config=raster_config)
