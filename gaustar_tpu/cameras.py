"""Camera model.

Single source of truth: per-camera intrinsics (fx, fy, cx, cy, width, height) and a
world-to-camera rigid transform, from which we derive exactly the matrices the
reference rasterizer consumes:

  - `view` — the 4x4 world-to-view matrix (reference `world_view_transform`, stored
    transposed there for glm; we keep the logical row-major matrix and apply it as
    p_view = view[:3, :3] @ p + view[:3, 3], which is numerically identical to
    transformPoint4x3 in auxiliary.h:58-66).
  - `proj` — the GL-style perspective matrix of gaustar_utils/graphics_utils.py:64-85
    with the SuGaR principal-point terms P[0,2] = (cx - W/2)/s, P[1,2] = (cy - H/2)/s,
    s = min(W, H)/2 (sugar_model.py:1160-1161 combined with the pytorch3d NDC
    convention of cameras.py:300-318; for the centered-principal-point ActorsHQ data
    these terms are zero).
  - `full_proj = proj @ view` (reference `full_proj_transform`).
  - `camera_center` — world-space camera position.

Convention notes: the reference stores per-camera (R, T) where R is the *transposed*
w2c rotation (c2w rotation) and T the w2c translation (cameras.py:55-65, 212-215).
We use the same storage so checkpoints/cameras.json round-trip bit-exactly.

Image sizes are static python ints (jit shape parameters); all float quantities are
pytree leaves.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def fov2focal(fov, pixels):
    return pixels / (2.0 * np.tan(fov / 2.0))


def focal2fov(focal, pixels):
    return 2.0 * np.arctan(pixels / (2.0 * focal))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """One pinhole camera in the 3DGS convention.

    R: [3, 3] c2w rotation (reference GSCamera.R), T: [3] w2c translation.
    fx, fy, cx, cy: pixel intrinsics. width/height are static.
    """

    R: Any
    T: Any
    fx: Any
    fy: Any
    cx: Any
    cy: Any
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    znear: float = dataclasses.field(default=0.01, metadata=dict(static=True))
    zfar: float = dataclasses.field(default=100.0, metadata=dict(static=True))

    # -- derived quantities ------------------------------------------------

    @property
    def tanfovx(self):
        return self.width / (2.0 * self.fx)

    @property
    def tanfovy(self):
        return self.height / (2.0 * self.fy)

    @property
    def view(self):
        """4x4 world-to-view matrix (graphics_utils.py getWorld2View)."""
        R = jnp.asarray(self.R, jnp.float32)
        T = jnp.asarray(self.T, jnp.float32)
        top = jnp.concatenate([R.T, T[:, None]], axis=1)
        bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], jnp.float32)
        return jnp.concatenate([top, bottom], axis=0)

    @property
    def proj(self):
        """GL-style projection with SuGaR principal-point terms (see module doc)."""
        z_sign = 1.0
        zf, zn = self.zfar, self.znear
        s = min(self.width, self.height) / 2.0
        px = (jnp.asarray(self.cx, jnp.float32) - self.width / 2.0) / s
        py = (jnp.asarray(self.cy, jnp.float32) - self.height / 2.0) / s
        one = jnp.ones((), jnp.float32)
        zero = jnp.zeros((), jnp.float32)
        P = jnp.stack(
            [
                jnp.stack([one / self.tanfovx, zero, px, zero]),
                jnp.stack([zero, one / self.tanfovy, py, zero]),
                jnp.stack([zero, zero, one * z_sign * zf / (zf - zn), -one * (zf * zn) / (zf - zn)]),
                jnp.stack([zero, zero, one * z_sign, zero]),
            ]
        )
        return P

    @property
    def full_proj(self):
        return self.proj @ self.view

    @property
    def camera_center(self):
        """World-space camera position: c2w translation = -R @ T."""
        return -jnp.asarray(self.R, jnp.float32) @ jnp.asarray(self.T, jnp.float32)

    # -- constructors ------------------------------------------------------

    @staticmethod
    def from_w2c(w2c: np.ndarray, fx, fy, cx, cy, width: int, height: int, **kw) -> "Camera":
        """From a 4x4 world-to-camera matrix (COLMAP/OpenCV convention)."""
        w2c = np.asarray(w2c, np.float64)
        return Camera(
            R=np.ascontiguousarray(w2c[:3, :3].T).astype(np.float32),
            T=w2c[:3, 3].astype(np.float32),
            fx=np.float32(fx),
            fy=np.float32(fy),
            cx=np.float32(cx),
            cy=np.float32(cy),
            width=int(width),
            height=int(height),
            **kw,
        )

    @staticmethod
    def from_c2w_opengl(c2w: np.ndarray, fx, fy, cx, cy, width: int, height: int, **kw) -> "Camera":
        """From an OpenGL/Blender (Y-up, Z-back) camera-to-world matrix.

        This is the nerfstudio `camera_to_worlds` convention that the reference
        flips in sugar_model.py:1131-1141.
        """
        c2w = np.asarray(c2w, np.float64).copy()
        if c2w.shape == (3, 4):
            c2w = np.concatenate([c2w, [[0.0, 0.0, 0.0, 1.0]]], axis=0)
        c2w[:3, 1:3] *= -1.0
        w2c = np.linalg.inv(c2w)
        return Camera.from_w2c(w2c, fx, fy, cx, cy, width, height, **kw)

    def downscale(self, factor: float) -> "Camera":
        """Downscale resolution (reference refine.py:275-280 downscale path)."""
        return dataclasses.replace(
            self,
            fx=self.fx / factor,
            fy=self.fy / factor,
            cx=self.cx / factor,
            cy=self.cy / factor,
            width=int(round(self.width / factor)),
            height=int(round(self.height / factor)),
        )


def stack_cameras(cams: list[Camera]) -> Camera:
    """Stack same-resolution cameras into one batched Camera (leading axis N)."""
    w, h = cams[0].width, cams[0].height
    assert all(c.width == w and c.height == h for c in cams), "stack requires equal sizes"
    leaves = [
        jnp.asarray(np.stack([np.asarray(getattr(c, f), np.float32) for c in cams]))
        for f in ("R", "T", "fx", "fy", "cx", "cy")
    ]  # device arrays so index_camera works with traced indices
    return Camera(*leaves, width=w, height=h, znear=cams[0].znear, zfar=cams[0].zfar)


def index_camera(cams: Camera, i) -> Camera:
    """Select camera i from a batched Camera (works with traced indices)."""
    return Camera(
        R=cams.R[i],
        T=cams.T[i],
        fx=cams.fx[i],
        fy=cams.fy[i],
        cx=cams.cx[i],
        cy=cams.cy[i],
        width=cams.width,
        height=cams.height,
        znear=cams.znear,
        zfar=cams.zfar,
    )


def orbit_cameras(
    center: np.ndarray,
    distance: float,
    width: int,
    height: int,
    focal: float,
    n_azim: int = 12,
    elevations=(-40.0, -20.0, 0.0, 20.0, 40.0),
) -> list[Camera]:
    """72 orbit cameras as in refined_mesh.py:55-81 sample_cam (azim 0:360:30 x
    elev -40:40:20) used for TSDF fusion views."""
    cams = []
    for elev in elevations:
        for k in range(n_azim):
            azim = 360.0 * k / n_azim
            e, a = np.deg2rad(elev), np.deg2rad(azim)
            # Camera position on the orbit sphere.
            pos = center + distance * np.array(
                [np.cos(e) * np.sin(a), np.sin(e), np.cos(e) * np.cos(a)]
            )
            # Look-at: z forward towards center, y down-ish (OpenCV).
            z = center - pos
            z = z / np.linalg.norm(z)
            up = np.array([0.0, -1.0, 0.0])
            x = np.cross(up, z)
            if np.linalg.norm(x) < 1e-6:
                x = np.array([1.0, 0.0, 0.0])
            x = x / np.linalg.norm(x)
            y = np.cross(z, x)
            Rc2w = np.stack([x, y, z], axis=1)
            w2c = np.eye(4)
            w2c[:3, :3] = Rc2w.T
            w2c[:3, 3] = -Rc2w.T @ pos
            cams.append(
                Camera.from_w2c(w2c, focal, focal, width / 2.0, height / 2.0, width, height)
            )
    return cams
