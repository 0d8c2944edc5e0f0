"""Bisect the render fwd+bwd gap: where does backward time beyond the custom
VJPs go? Stop-gradient walls at pipeline joints isolate each segment's VJP cost
(run on the chip: timeout 900 python examples/profile_bisect.py)."""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import W, H, build_scene
from gaustar_tpu.cameras import index_camera
from gaustar_tpu.models import sugar
from gaustar_tpu.ops import binning
from gaustar_tpu.ops.projection import TILE, preprocess
from gaustar_tpu.train.refine import RefineConfig
from gaustar_tpu.utils.profiling import loop_bench

ITERS = 8


def main():
    params, config, data, raster_cfg = build_scene()
    camera = index_camera(data.cameras, 0)
    cfg = RefineConfig(num_iterations=2000, loose_bind_from=10**9, do_sh_warmup=False)

    def render_loss(pts, *, sg_pair=False, sg_geom=False, sg_color=False):
        """One fused RGBD render; stop-gradient walls applied inside."""
        p = dataclasses.replace(params, points=pts)
        positions = sugar.gaussian_centers(p, config)
        if sg_geom:
            positions = jax.lax.stop_gradient(positions)
        rgb = sugar.points_rgb(p, positions, camera.camera_center, 2)
        if sg_color:
            rgb = jax.lax.stop_gradient(rgb)
        view = camera.view
        z = positions @ view[2, :3] + view[2, 3]
        colors4 = jnp.concatenate([rgb, z[:, None]], axis=-1)
        cov = sugar.covariance6(p, config)
        if sg_geom:
            cov = jax.lax.stop_gradient(cov)
        op = sugar.strengths(p)

        from gaustar_tpu.ops import blend_jax
        from gaustar_tpu.ops.blend_pallas import blend_tiles_pallas

        grid_x = (W + TILE - 1) // TILE
        grid_y = (H + TILE - 1) // TILE
        g = preprocess(positions, cov, op, colors4, camera)
        binned = binning.bin_gaussians(
            g, grid_x, grid_y, raster_cfg.max_pairs, raster_cfg.chunk, raster_cfg.max_padded
        )
        pd = binning.gather_pair_data(g, binned)
        if sg_pair:
            pd = jax.lax.stop_gradient(pd)
        color_cp, final_t_t, _ = blend_tiles_pallas(
            pd, binned.tile_start, binned.tile_nchunks, grid_x, grid_y, W, H,
            raster_cfg.chunk, 4,
        )
        color_t = color_cp.transpose(0, 2, 1)
        color = blend_jax.assemble_image(color_t, grid_x, grid_y, W, H)
        final_t = blend_jax.assemble_image(final_t_t[..., None], grid_x, grid_y, W, H)[..., 0]
        img = color + final_t[..., None] * jnp.asarray([0.0, 1.0, 0.0, cfg.max_depth])
        return img.sum() * 1e-3

    variants = {
        "full": {},
        "sg_pair(fwd only)": {"sg_pair": True},
        "sg_geom(color grads)": {"sg_geom": True},
        "sg_color(geom grads)": {"sg_color": True},
    }
    for name, kw in variants.items():
        def f(i, pts, kw=kw):
            l, gr = jax.value_and_grad(lambda pp: render_loss(pp, **kw))(pts + i * 0.0)
            return l + gr.sum()

        t = loop_bench(f, params.points, iters=ITERS)
        print(f"{name:24s} {t*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
