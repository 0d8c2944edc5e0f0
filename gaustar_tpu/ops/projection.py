"""Gaussian preprocessing: projection, EWA 2D covariance, conic, tile extents.

This is the JAX equivalent of preprocessCUDA (cuda_rasterizer/forward.cu:156-256)
and its helpers computeCov3D (forward.cu:118-152) / computeCov2D (forward.cu:74-113).
It is pure jnp — XLA vectorizes it over all Gaussians on the VPU, and JAX autodiff
reproduces the hand-derived backward of backward.cu:144-396 (the clamp masks
x_grad_mul/y_grad_mul and the SH clamp fall out of differentiating the identical
forward expressions).

All numeric pecularities of the reference are preserved:
  - quaternions are used UNNORMALIZED in cov3D (forward.cu:127); callers normalize.
  - view-space x/y clamped to +-1.3*tanfov before the EWA Jacobian (forward.cu:86-91).
  - +0.3 px low-pass on the cov2D diagonal (forward.cu:110-111).
  - eigenvalue floor sqrt(max(0.1, mid^2-det)), radius = ceil(3*sqrt(lambda_max)).
  - near-cull at view z <= 0.2 (auxiliary.h:153-173), w-division eps 1e-7.
  - ndc2Pix(v, S) = ((v+1)*S - 1)/2 (auxiliary.h:41-44).
  - 16x16 pixel tiles (config.h:16-17).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gaustar_tpu.cameras import Camera

TILE = 16


class Gaussians2D(NamedTuple):
    """Screen-space Gaussians produced by `preprocess` (all [N, ...])."""

    mean2d: jnp.ndarray  # [N, 2] pixel coords
    depth: jnp.ndarray  # [N] view-space z
    conic: jnp.ndarray  # [N, 3] inverse cov2d (A, B, C)
    opacity: jnp.ndarray  # [N]
    color: jnp.ndarray  # [N, C] per-gaussian features to blend
    radius: jnp.ndarray  # [N] int32 pixel radius (0 => culled)
    rect_min: jnp.ndarray  # [N, 2] int32 (tx0, ty0) tile rect
    rect_max: jnp.ndarray  # [N, 2] int32 (tx1, ty1) exclusive
    tiles_touched: jnp.ndarray  # [N] int32


def quat_scale_to_cov3d(scales: jnp.ndarray, quats: jnp.ndarray, scale_modifier: float = 1.0):
    """Sigma = (S R)^T (S R) with w-first quaternion, NOT normalized (forward.cu:118-152).

    Returns the 6 upper-triangular entries [N, 6] in the order
    (xx, xy, xz, yy, yz, zz)."""
    r, x, y, z = quats[..., 0], quats[..., 1], quats[..., 2], quats[..., 3]
    # R exactly as in the CUDA kernel (glm column-major constructor transposes; the
    # net effect is the standard w-first rotation matrix).
    R00 = 1.0 - 2.0 * (y * y + z * z)
    R01 = 2.0 * (x * y - r * z)
    R02 = 2.0 * (x * z + r * y)
    R10 = 2.0 * (x * y + r * z)
    R11 = 1.0 - 2.0 * (x * x + z * z)
    R12 = 2.0 * (y * z - r * x)
    R20 = 2.0 * (x * z - r * y)
    R21 = 2.0 * (y * z + r * x)
    R22 = 1.0 - 2.0 * (x * x + y * y)

    sx = scales[..., 0] * scale_modifier
    sy = scales[..., 1] * scale_modifier
    sz = scales[..., 2] * scale_modifier

    # M = S @ R  (rows of R scaled), Sigma = M^T M = R^T S^2 R.
    m0x, m0y, m0z = sx * R00, sx * R01, sx * R02
    m1x, m1y, m1z = sy * R10, sy * R11, sy * R12
    m2x, m2y, m2z = sz * R20, sz * R21, sz * R22

    c_xx = m0x * m0x + m1x * m1x + m2x * m2x
    c_xy = m0x * m0y + m1x * m1y + m2x * m2y
    c_xz = m0x * m0z + m1x * m1z + m2x * m2z
    c_yy = m0y * m0y + m1y * m1y + m2y * m2y
    c_yz = m0y * m0z + m1y * m1z + m2y * m2z
    c_zz = m0z * m0z + m1z * m1z + m2z * m2z
    return jnp.stack([c_xx, c_xy, c_xz, c_yy, c_yz, c_zz], axis=-1)


def ewa_cov2d(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    view: jnp.ndarray,
    focal_x,
    focal_y,
    tanfovx,
    tanfovy,
):
    """EWA projection of 3D covariance to 2D (forward.cu:74-113). Returns [N, 3]
    (cov_xx, cov_xy, cov_yy) including the +0.3 low-pass."""
    Rv = view[:3, :3]
    tv = view[:3, 3]
    t = means3d @ Rv.T + tv  # [N, 3] view-space

    limx = 1.3 * tanfovx
    limy = 1.3 * tanfovy
    tz = t[:, 2]
    txtz = t[:, 0] / tz
    tytz = t[:, 1] / tz
    tx = jnp.clip(txtz, -limx, limx) * tz
    ty = jnp.clip(tytz, -limy, limy) * tz

    # J rows (only the two rows that matter): the 2x3 Jacobian of (u, v) wrt t.
    j00 = focal_x / tz
    j02 = -(focal_x * tx) / (tz * tz)
    j11 = focal_y / tz
    j12 = -(focal_y * ty) / (tz * tz)

    # U = J_2x3 @ Rv : the combined world->screen linear map (2x3 per gaussian).
    u0 = j00[:, None] * Rv[0][None, :] + j02[:, None] * Rv[2][None, :]  # [N, 3]
    u1 = j11[:, None] * Rv[1][None, :] + j12[:, None] * Rv[2][None, :]  # [N, 3]

    # cov2d = U Sigma U^T with Sigma from the packed 6 entries.
    c_xx, c_xy, c_xz, c_yy, c_yz, c_zz = (cov3d[:, i] for i in range(6))

    def sig_mul(v):  # Sigma @ v for packed symmetric Sigma
        return jnp.stack(
            [
                c_xx * v[:, 0] + c_xy * v[:, 1] + c_xz * v[:, 2],
                c_xy * v[:, 0] + c_yy * v[:, 1] + c_yz * v[:, 2],
                c_xz * v[:, 0] + c_yz * v[:, 1] + c_zz * v[:, 2],
            ],
            axis=-1,
        )

    s_u0 = sig_mul(u0)
    s_u1 = sig_mul(u1)
    cov_xx = (u0 * s_u0).sum(-1) + 0.3
    cov_xy = (u0 * s_u1).sum(-1)
    cov_yy = (u1 * s_u1).sum(-1) + 0.3
    return jnp.stack([cov_xx, cov_xy, cov_yy], axis=-1)


def ndc2pix(v, size):
    return ((v + 1.0) * size - 1.0) * 0.5


def preprocess(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,
    camera: Camera,
) -> Gaussians2D:
    """Project gaussians to screen space (preprocessCUDA, forward.cu:156-256).

    `colors` are the per-gaussian blend features (RGB from SH evaluated by the model
    layer — the reference's compute_color_in_rasterizer=False default path,
    sugar_model.py:1193-1206 — or view-space depth for depth rendering).
    """
    view = camera.view
    full_proj = camera.full_proj
    W, H = camera.width, camera.height
    focal_x = W / (2.0 * camera.tanfovx)
    focal_y = H / (2.0 * camera.tanfovy)

    # View-space position and near-cull.
    p_view = means3d @ view[:3, :3].T + view[:3, 3]
    depth = p_view[:, 2]
    in_front = depth > 0.2

    # Full projection (with principal-point terms) and w-division.
    p_hom = means3d @ full_proj[:3, :3].T + full_proj[:3, 3]
    p_w_h = means3d @ full_proj[3, :3] + full_proj[3, 3]
    p_w = 1.0 / (p_w_h + 1e-7)
    ndc_xy = p_hom[:, :2] * p_w[:, None]
    mean2d = jnp.stack([ndc2pix(ndc_xy[:, 0], W), ndc2pix(ndc_xy[:, 1], H)], axis=-1)

    cov2d = ewa_cov2d(means3d, cov3d, view, focal_x, focal_y, camera.tanfovx, camera.tanfovy)
    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] * cov2d[:, 1]
    det_ok = det != 0.0
    det_inv = 1.0 / jnp.where(det_ok, det, 1.0)
    conic = jnp.stack(
        [cov2d[:, 2] * det_inv, -cov2d[:, 1] * det_inv, cov2d[:, 0] * det_inv], axis=-1
    )

    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    lam_max = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam_max, 0.0)))

    # EXACT per-axis support shrink (TPU-first; outputs bit-identical to the
    # CUDA 3*sigma_max box): a pixel contributes only when
    # alpha = op * exp(-q/2) >= 1/255 (forward.cu:345), and the conic
    # quadratic's marginal bound q >= dx^2 / cov_xx means |dx| beyond
    # hx = sqrt(2 ln(255 op) cov_xx) can never contribute (same for y). The
    # CUDA rect is the ISOTROPIC square of radius 3 sqrt(lam_max) on both
    # axes — for SuGaR's surface-bound gaussians (flat ellipses seen
    # obliquely) and for low-opacity gaussians the tight per-axis box lists
    # far fewer (gaussian, tile) pairs. Clamped by radius_f, the listed set
    # is a SUBSET of CUDA's whose dropped pairs are all below the 1/255 skip
    # — forward, backward, and n_contrib are exactly unchanged; only pair
    # buffers (descriptor/sort/scan cost ~ proportional to pairs) shrink.
    # On CUDA a useless pair costs ~nothing; here each one costs real rows.
    op_flat = opacities.reshape(-1)
    two_l = 2.0 * jnp.log(jnp.maximum(op_flat, 1.0 / 255.0) * 255.0)
    hx = jnp.ceil(jnp.sqrt(jnp.maximum(two_l * cov2d[:, 0], 0.0)))
    hy = jnp.ceil(jnp.sqrt(jnp.maximum(two_l * cov2d[:, 2], 0.0)))
    rx_f = jnp.minimum(radius_f, hx)
    ry_f = jnp.minimum(radius_f, hy)

    # Tile rect (getRect, auxiliary.h:46-57). grid dims from padded image size.
    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE
    # CUDA truncates toward zero after float division; for the min corner the operand
    # can be negative, where int-cast truncation (toward 0) == floor after the max(0).
    rx0 = jnp.clip(((mean2d[:, 0] - rx_f) / TILE).astype(jnp.int32), 0, grid_x)
    ry0 = jnp.clip(((mean2d[:, 1] - ry_f) / TILE).astype(jnp.int32), 0, grid_y)
    # Max corner: CUDA's (p + r + TILE-1)/TILE trunc is ceil only for INTEGER
    # p + r — for fractional p it can miss the topmost sliver pixel. With
    # CUDA's own radius that quirk is part of the parity contract, but the
    # shrunk axes must not drop DIFFERENT pixels than CUDA would, so they use
    # a true ceil (+TILE overshoots by at most one tile) and clamp inside
    # CUDA's quirk-for-quirk rect — the listed set stays a superset of
    # (CUDA's rect ∩ the alpha >= 1/255 support) and a subset of CUDA's rect.
    rx1_cuda = ((mean2d[:, 0] + radius_f + TILE - 1) / TILE).astype(jnp.int32)
    ry1_cuda = ((mean2d[:, 1] + radius_f + TILE - 1) / TILE).astype(jnp.int32)
    rx1 = jnp.clip(
        jnp.minimum(rx1_cuda, ((mean2d[:, 0] + rx_f + TILE) / TILE).astype(jnp.int32)),
        0, grid_x,
    )
    ry1 = jnp.clip(
        jnp.minimum(ry1_cuda, ((mean2d[:, 1] + ry_f + TILE) / TILE).astype(jnp.int32)),
        0, grid_y,
    )

    touched = (rx1 - rx0) * (ry1 - ry0)
    # Opacity cull: the blend skips every pair with alpha < 1/255
    # (forward.cu:345, blend contrib mask), and alpha = min(0.99,
    # opacity * exp(power)) <= opacity on the power <= 0 branch (the only one
    # that contributes), so a gaussian with opacity < 1/255 NEVER contributes
    # to forward or backward — culling it here is exact and keeps bucketing's
    # zero-opacity padding gaussians (train/bucketing.py) out of the pair
    # buffers entirely.
    alive = in_front & det_ok & (touched > 0) & (op_flat >= 1.0 / 255.0)

    radius = jnp.where(alive, radius_f, 0.0).astype(jnp.int32)
    touched = jnp.where(alive, touched, 0)

    return Gaussians2D(
        mean2d=mean2d,
        depth=depth,
        conic=conic,
        opacity=opacities.reshape(-1),
        color=colors,
        radius=radius,
        rect_min=jnp.stack([rx0, ry0], axis=-1),
        rect_max=jnp.stack([rx1, ry1], axis=-1),
        tiles_touched=touched,
    )
