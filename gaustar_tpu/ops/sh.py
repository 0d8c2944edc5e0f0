"""Spherical harmonics evaluation.

Implements the real SH basis used by 3D Gaussian splatting, matching the reference
numerics of /root/reference/gaustar_utils/spherical_harmonics.py:117-178 (python path)
and .../cuda_rasterizer/forward.cu:20-71 (in-rasterizer path with +0.5 offset and
clamp-to-positive whose mask is carried into the backward pass — here JAX autodiff
produces the identical clamp-masked gradient automatically).

Coefficient layout: sh[..., K, C] with K = (deg+1)**2 bands and C color channels,
matching the reference's `sh_coordinates` (dc first, then rest).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gaustar_tpu.utils.general import l2norm

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)


def num_sh_coeffs(deg: int) -> int:
    return (deg + 1) ** 2


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH at unit directions. sh: [..., K, C]; dirs: [..., 3] -> [..., C]."""
    assert 0 <= deg <= 4
    assert sh.shape[-2] >= num_sh_coeffs(deg)

    result = C0 * sh[..., 0, :]
    if deg > 0:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        result = result - C1 * y * sh[..., 1, :] + C1 * z * sh[..., 2, :] - C1 * x * sh[..., 3, :]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + C2[0] * xy * sh[..., 4, :]
                + C2[1] * yz * sh[..., 5, :]
                + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                + C2[3] * xz * sh[..., 7, :]
                + C2[4] * (xx - yy) * sh[..., 8, :]
            )
            if deg > 2:
                result = (
                    result
                    + C3[0] * y * (3.0 * xx - yy) * sh[..., 9, :]
                    + C3[1] * xy * z * sh[..., 10, :]
                    + C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11, :]
                    + C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12, :]
                    + C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13, :]
                    + C3[5] * z * (xx - yy) * sh[..., 14, :]
                    + C3[6] * x * (xx - 3.0 * yy) * sh[..., 15, :]
                )
                if deg > 3:
                    result = (
                        result
                        + C4[0] * xy * (xx - yy) * sh[..., 16, :]
                        + C4[1] * yz * (3.0 * xx - yy) * sh[..., 17, :]
                        + C4[2] * xy * (7.0 * zz - 1.0) * sh[..., 18, :]
                        + C4[3] * yz * (7.0 * zz - 3.0) * sh[..., 19, :]
                        + C4[4] * (zz * (35.0 * zz - 30.0) + 3.0) * sh[..., 20, :]
                        + C4[5] * xz * (7.0 * zz - 3.0) * sh[..., 21, :]
                        + C4[6] * (xx - yy) * (7.0 * zz - 1.0) * sh[..., 22, :]
                        + C4[7] * xz * (xx - 3.0 * yy) * sh[..., 23, :]
                        + C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)) * sh[..., 24, :]
                    )
    return result


def _basis_terms(deg: int, x, y, z):
    """SH basis polynomials as a flat list of [N] arrays with their signs folded
    in, band order matching eval_sh."""
    terms = [None]  # band 0 handled by C0 directly
    if deg > 0:
        terms += [-C1 * y, C1 * z, -C1 * x]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            terms += [
                C2[0] * x * y,
                C2[1] * y * z,
                C2[2] * (2.0 * zz - xx - yy),
                C2[3] * x * z,
                C2[4] * (xx - yy),
            ]
            if deg > 2:
                terms += [
                    C3[0] * y * (3.0 * xx - yy),
                    C3[1] * x * y * z,
                    C3[2] * y * (4.0 * zz - xx - yy),
                    C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
                    C3[4] * x * (4.0 * zz - xx - yy),
                    C3[5] * z * (xx - yy),
                    C3[6] * x * (xx - 3.0 * yy),
                ]
                if deg > 3:
                    terms += [
                        C4[0] * x * y * (xx - yy),
                        C4[1] * y * z * (3.0 * xx - yy),
                        C4[2] * x * y * (7.0 * zz - 1.0),
                        C4[3] * y * z * (7.0 * zz - 3.0),
                        C4[4] * (zz * (35.0 * zz - 30.0) + 3.0),
                        C4[5] * x * z * (7.0 * zz - 3.0),
                        C4[6] * (xx - yy) * (7.0 * zz - 1.0),
                        C4[7] * x * z * (xx - 3.0 * yy),
                        C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
                    ]
    return terms


def eval_sh_soa(deg: int, sh_t: jnp.ndarray, x, y, z) -> jnp.ndarray:
    """Component-major SH eval: sh_t [K, C, N], unit-dir components [N] each ->
    [N, C]. Same math as eval_sh, but every op is a full-lane [N] vector — the
    [N, K, C] form's [N, 3]-shaped band accumulations run at 3/128 lane
    utilization and cost ~4x more on TPU (ROOFLINE.md)."""
    assert 0 <= deg <= 4
    k = num_sh_coeffs(deg)
    assert sh_t.shape[0] >= k
    c = sh_t.shape[1]
    terms = _basis_terms(deg, x, y, z)
    out = [C0 * sh_t[0, ch] for ch in range(c)]
    for band in range(1, k):
        b = terms[band]
        for ch in range(c):
            out[ch] = out[ch] + b * sh_t[band, ch]
    return jnp.stack(out, axis=-1)


def eval_sh_soa_banded(sh_t: jnp.ndarray, x, y, z, deg_w: jnp.ndarray) -> jnp.ndarray:
    """eval_sh_soa over the FULL basis in sh_t with per-DEGREE weights deg_w
    [L] (traced). deg_w[d] = 0 reproduces static truncation at degree d-1
    exactly — same values AND same (zero) gradients to the masked bands — so
    the SH warmup schedule becomes a traced input instead of a re-jit per
    degree (refine.py:837-839 semantics, one XLA program for the whole frame)."""
    k = sh_t.shape[0]
    deg = int(np.sqrt(k)) - 1
    assert (deg + 1) ** 2 == k, f"banded eval needs a full basis, got K={k}"
    c = sh_t.shape[1]
    terms = _basis_terms(deg, x, y, z)
    w0 = deg_w[0]
    out = [w0 * C0 * sh_t[0, ch] for ch in range(c)]
    for band in range(1, k):
        d = int(np.sqrt(band))  # degree of this band
        b = terms[band] * deg_w[d]
        for ch in range(c):
            out[ch] = out[ch] + b * sh_t[band, ch]
    return jnp.stack(out, axis=-1)


def sh_to_rgb_banded(
    sh: jnp.ndarray, positions: jnp.ndarray, campos: jnp.ndarray, deg_w: jnp.ndarray
) -> jnp.ndarray:
    """sh_to_rgb with traced per-degree weights (see eval_sh_soa_banded)."""
    d = positions - campos
    inv = 1.0 / jnp.sqrt(
        jnp.maximum(d[:, 0] ** 2 + d[:, 1] ** 2 + d[:, 2] ** 2, 1e-24)
    )
    x, y, z = d[:, 0] * inv, d[:, 1] * inv, d[:, 2] * inv
    sh_t = sh.transpose(1, 2, 0)  # [K, C, N]
    return jnp.maximum(eval_sh_soa_banded(sh_t, x, y, z, deg_w) + 0.5, 0.0)


def warmup_degree_weights(current_deg, levels: int) -> jnp.ndarray:
    """[levels] 0/1 degree weights for a (possibly traced) current degree."""
    return (jnp.arange(levels) <= current_deg).astype(jnp.float32)


def sh_to_rgb(deg: int, sh: jnp.ndarray, positions: jnp.ndarray, campos: jnp.ndarray) -> jnp.ndarray:
    """Rasterizer-style SH color: eval at view direction, +0.5 offset, clamp >= 0.

    Mirrors computeColorFromSH (forward.cu:20-71). The clamp mask is what the CUDA
    backward replays; jnp.maximum's VJP reproduces it exactly.
    """
    d = positions - campos
    # max INSIDE the sqrt: grad-safe at d == 0 (see utils.general.l2norm)
    inv = 1.0 / jnp.sqrt(
        jnp.maximum(d[:, 0] ** 2 + d[:, 1] ** 2 + d[:, 2] ** 2, 1e-24)
    )
    x, y, z = d[:, 0] * inv, d[:, 1] * inv, d[:, 2] * inv
    sh_t = sh.transpose(1, 2, 0)  # [K, C, N]: ONE relayout, then full-lane math
    return jnp.maximum(eval_sh_soa(deg, sh_t, x, y, z) + 0.5, 0.0)


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    return (rgb - 0.5) / C0


def sh_to_rgb_dc(sh: jnp.ndarray) -> jnp.ndarray:
    return sh * C0 + 0.5
