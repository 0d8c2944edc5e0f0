"""Dense reference rasterizer — the numerical oracle.

Evaluates every (gaussian, pixel) pair, O(N * H * W): exactly the blending semantics
of renderCUDA (cuda_rasterizer/forward.cu:261-374) expressed in closed cumulative
form so that plain JAX autodiff yields the analytic backward of backward.cu. Used
for golden-value tests of the production tiled/Pallas rasterizer and for tiny-scene
CPU runs; never on the hot path.

Semantics replicated exactly:
  - global sort by (depth, gaussian index) — equal to the CUDA pair sort (stable
    radix over [tileID | depth-bits]) restricted to any one tile;
  - a gaussian reaches a pixel only if the pixel's 16x16 tile is inside the
    gaussian's tile rect (tile binning visibility, not just the 3-sigma test);
  - skip if power > 0 or alpha < 1/255; alpha = min(0.99, opacity * exp(power));
  - sticky early-stop: the first contribution that would push transmittance below
    1e-4 is dropped and ends the pixel (forward.cu:335-351);
  - out = sum(c * alpha * T) + T_final * bg; final_T and 1-based n_contrib saved.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gaustar_tpu.cameras import Camera
from gaustar_tpu.ops.projection import TILE, Gaussians2D, preprocess


class RenderOutput(NamedTuple):
    color: jnp.ndarray  # [H, W, C] blended features WITHOUT background
    final_T: jnp.ndarray  # [H, W] final transmittance
    n_contrib: jnp.ndarray  # [H, W] int32, 1-based index of last contributor
    radii: jnp.ndarray  # [N] int32 screen radii (0 = culled)

    def composite(self, bg) -> jnp.ndarray:
        """image = color + T * bg (forward.cu:367-373)."""
        return self.color + self.final_T[..., None] * jnp.asarray(bg, jnp.float32)


def clamp_alpha_ste(alpha: jnp.ndarray) -> jnp.ndarray:
    """min(0.99, alpha) with a straight-through gradient.

    backward.cu:477-508 recomputes alpha = min(0.99, opacity * G) but then emits
    dL/dopacity = G * dL/dalpha and dL/dG = opacity * dL/dalpha UNCONDITIONALLY —
    the CUDA backward never zeroes the gradient where the 0.99 clamp is active.
    Plain autodiff of jnp.minimum would; this helper reproduces the CUDA
    semantics so all three paths (oracle, jax tiles, pallas) agree.
    """
    import jax as _jax

    return alpha + _jax.lax.stop_gradient(jnp.minimum(alpha, 0.99) - alpha)


def blend_prefix_ops(a0: jnp.ndarray, contrib: jnp.ndarray, t_in=None):
    """Shared closed-form blend: given per-(gaussian, pixel) raw alphas a0 [M, P]
    (already zeroed where not contributing) in front-to-back order and the contrib
    mask, return (a_eff, T_before, included) honoring the sticky 1e-4 early stop.

    This is the exact vectorization of the sequential CUDA loop: T~ is the
    transmittance assuming no early stop, which is correct up to and including the
    first stopping contribution — everything after it is excluded anyway.
    """
    one_m = 1.0 - a0
    if t_in is None:
        t_in = jnp.ones_like(a0[:1])
    # Exclusive prefix product along the gaussian axis.
    cp = jnp.cumprod(one_m, axis=0)
    t_tilde = t_in * jnp.concatenate([jnp.ones_like(cp[:1]), cp[:-1]], axis=0)
    flag = contrib & (t_tilde * one_m < 1e-4)
    stopped = jnp.cumsum(flag.astype(jnp.int32), axis=0) > 0  # inclusive: stopper excluded
    included = contrib & ~stopped
    a_eff = jnp.where(included, a0, 0.0)
    cp2 = jnp.cumprod(1.0 - a_eff, axis=0)
    t_before = t_in * jnp.concatenate([jnp.ones_like(cp2[:1]), cp2[:-1]], axis=0)
    return a_eff, t_before, included


def rasterize_dense(g: Gaussians2D, width: int, height: int) -> RenderOutput:
    """Blend preprocessed gaussians over the full image (oracle path)."""
    n = g.mean2d.shape[0]
    order = jnp.argsort(g.depth, stable=True)
    xy = g.mean2d[order]
    conic = g.conic[order]
    opac = g.opacity[order]
    color = g.color[order]
    alive = (g.radius > 0)[order]
    rect_min = g.rect_min[order]
    rect_max = g.rect_max[order]

    px = jnp.arange(width, dtype=jnp.float32)[None, :].repeat(height, 0).reshape(-1)
    py = jnp.arange(height, dtype=jnp.float32)[:, None].repeat(width, 1).reshape(-1)
    ptx = (px / TILE).astype(jnp.int32)
    pty = (py / TILE).astype(jnp.int32)

    dx = xy[:, 0:1] - px[None, :]  # [N, P]
    dy = xy[:, 1:2] - py[None, :]
    power = (
        -0.5 * (conic[:, 0:1] * dx * dx + conic[:, 2:3] * dy * dy) - conic[:, 1:2] * dx * dy
    )
    alpha_raw = clamp_alpha_ste(opac[:, None] * jnp.exp(power))

    in_rect = (
        (ptx[None, :] >= rect_min[:, 0:1])
        & (ptx[None, :] < rect_max[:, 0:1])
        & (pty[None, :] >= rect_min[:, 1:2])
        & (pty[None, :] < rect_max[:, 1:2])
    )
    contrib = (power <= 0.0) & (alpha_raw >= 1.0 / 255.0) & alive[:, None] & in_rect
    a0 = jnp.where(contrib, alpha_raw, 0.0)

    a_eff, t_before, included = blend_prefix_ops(a0, contrib)

    w = a_eff * t_before  # [N, P]
    out_c = jnp.einsum("np,nc->pc", w, color)
    final_t = jnp.prod(1.0 - a_eff, axis=0)
    # CUDA's `contributor` counts position within the pixel's TILE pair list — every
    # pair binned to the tile increments it, even ones skipped by the power/alpha
    # tests (forward.cu:327-330). That list is exactly {alive & in_rect} in depth order.
    in_pair_list = alive[:, None] & in_rect
    pos = jnp.cumsum(in_pair_list.astype(jnp.int32), axis=0)
    n_contrib = jnp.max(jnp.where(included, pos, 0), axis=0, initial=0)

    c = g.color.shape[-1]
    return RenderOutput(
        color=out_c.reshape(height, width, c),
        final_T=final_t.reshape(height, width),
        n_contrib=n_contrib.reshape(height, width),
        radii=g.radius,
    )


def render_dense(
    means3d,
    cov3d,
    opacities,
    colors,
    camera: Camera,
    bg=(0.0, 0.0, 0.0),
):
    """Full oracle render: preprocess + dense blend + background composite."""
    g = preprocess(means3d, cov3d, opacities, colors, camera)
    out = rasterize_dense(g, camera.width, camera.height)
    return out.composite(bg), out
