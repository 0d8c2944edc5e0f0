"""Small device-side image helpers shared by detection/fusion pipelines.

Device (jnp) ports of the host geometry helpers (tools/geometry.py) used inside
jitted per-camera bodies, so full-resolution frames never cross to the host:
the reference pulls every rendered frame to CPU for this processing
(refined_mesh.py:742-813, 420-431); here only [V]- or volume-sized results do.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_blur(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """k x k box mean with reflect-101 borders (cv2.blur's BORDER_DEFAULT),
    as unrolled shifted-slice sums (k is tiny; XLA fuses the adds)."""
    p = k // 2
    xp = jnp.pad(x, ((p, p), (p, p)), mode="reflect")
    h, w = x.shape
    acc = xp[0:h, :]
    for i in range(1, k):
        acc = acc + xp[i : i + h, :]
    acc2 = acc[:, 0:w]
    for j in range(1, k):
        acc2 = acc2 + acc[:, j : j + w]
    return acc2 / float(k * k)


def depth_edge(depth: jnp.ndarray, ker: int) -> jnp.ndarray:
    """Depth-edge map = local variance via box filters — device port of
    geometry.get_depth_edge (warp_mesh.py:120-130) including its data-dependent
    foreground clamp (max over depth < 10, or 10 if empty, x1.1)."""
    fg = jnp.where(depth < 10.0, depth, -jnp.inf)
    mx = jnp.max(fg)
    max_depth = jnp.where(jnp.isfinite(mx), mx, 10.0) * 1.1
    d = jnp.minimum(depth, max_depth).astype(jnp.float32)
    return jnp.maximum(box_blur(d * d, ker) - box_blur(d, ker) ** 2, 0.0)


def query_nearest(image: jnp.ndarray, rc: jnp.ndarray):
    """Nearest-pixel lookup at float (row, col) coords: trunc(pix + 0.5) like
    geometry.query_at_image. Returns (values, inside-mask)."""
    rounded = jnp.trunc(rc + 0.5).astype(jnp.int32)
    bound = jnp.asarray(image.shape[:2], jnp.int32) - 1
    safe = jnp.clip(rounded, 0, bound)
    vals = image[safe[:, 0], safe[:, 1]]
    inside = (rounded >= 0).all(axis=-1) & (rounded <= bound).all(axis=-1)
    return vals, inside


def query_bilinear(image: jnp.ndarray, rc: jnp.ndarray):
    """Bilinear lookup at float (row, col) coords (geometry.query_at_image_bilinear)."""
    p = rc
    bound = jnp.asarray(image.shape[:2], jnp.float32) - 1.0
    pc = jnp.clip(p, 0.0, bound)
    r0 = jnp.floor(pc[:, 0]).astype(jnp.int32)
    c0 = jnp.floor(pc[:, 1]).astype(jnp.int32)
    r1 = jnp.minimum(r0 + 1, image.shape[0] - 1)
    c1 = jnp.minimum(c0 + 1, image.shape[1] - 1)
    fr = pc[:, 0] - r0
    fc = pc[:, 1] - c0
    vals = (
        image[r0, c0] * (1 - fr) * (1 - fc)
        + image[r0, c1] * (1 - fr) * fc
        + image[r1, c0] * fr * (1 - fc)
        + image[r1, c1] * fr * fc
    )
    inside = (p >= 0).all(axis=-1) & (p <= bound).all(axis=-1)
    return vals, inside
