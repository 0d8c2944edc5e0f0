"""Per-stage TPU profile of the full refine step at bench scale (ROOFLINE.md).

Isolates each pipeline stage of the 600k-gaussian / 1.6 MP training step so the
optimization effort targets the real hot spots, not guesses. Run on the chip:

    python examples/profile_step.py            # all stages
    python examples/profile_step.py blend      # only stages containing 'blend'
"""

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
from gaustar_tpu.ops.blend_pallas import blend_tiles_pallas
from gaustar_tpu.ops.projection import TILE, preprocess
from gaustar_tpu.ops import blend_jax
from gaustar_tpu.train.refine import RefineConfig, compute_losses, masked_rgb_loss
from gaustar_tpu.utils.profiling import loop_bench

ITERS = 8


def main():
    sel = sys.argv[1] if len(sys.argv) > 1 else ""
    params, config, data, raster_cfg = build_scene()
    camera = index_camera(data.cameras, 0)
    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE
    cfg = RefineConfig(num_iterations=2000, loose_bind_from=10**9, do_sh_warmup=False)

    # Precomputed stage inputs (fixed across timing loops). ONE jit for the
    # whole setup — eager dispatch over the axon tunnel pays a ~40 ms RPC
    # round-trip per op, which turns this block into minutes.
    @jax.jit
    def _setup(p):
        centers = sugar.gaussian_centers(p, config)
        cv = sugar.cov3d(p, config)
        op = sugar.strengths(p)
        col4 = jnp.ones((centers.shape[0], 4), jnp.float32) * 0.5
        g4 = preprocess(centers, cv, op, col4, camera)
        binned = binning.bin_gaussians(
            g4, grid_x, grid_y, raster_cfg.max_pairs, raster_cfg.chunk, raster_cfg.max_padded
        )
        pd = binning.gather_pair_data(g4, binned)
        return centers, cv, op, col4, g4, binned, pd

    centers, cov3d, opac, col4, g4, binned, pair_data = _setup(params)
    gt = data.gt_images[0]
    gt_depth = data.gt_depths[0]
    mask = jnp.ones((H, W), jnp.float32)
    img0 = jnp.zeros((H, W, 3), jnp.float32) + 0.3
    depth0 = jnp.zeros((H, W), jnp.float32) + 4.0

    stages = {}

    def stage(name, fn, *args):
        if sel and sel not in name:
            return
        t = loop_bench(fn, *args, iters=ITERS)
        stages[name] = t
        print(f"{name:28s} {t*1e3:9.2f} ms", flush=True)

    # --- model param -> primitive fwd ---
    def f_model(i, pts):
        c = sugar.gaussian_centers(dataclasses.replace(params, points=pts + i * 0.0), config)
        cv = sugar.cov3d(dataclasses.replace(params, points=pts + i * 0.0), config)
        return c.sum() + cv.sum()

    stage("sugar_primitives_fwd", f_model, params.points)

    # --- preprocess fwd ---
    def f_prep(i, m):
        g = preprocess(m + i * 0.0, cov3d, opac, col4, camera)
        return g.mean2d.sum() + g.conic.sum() + g.depth.sum()

    stage("preprocess_fwd", f_prep, centers)

    # --- binning ---
    def f_bin(i, m):
        g = preprocess(m + i * 0.0, cov3d, opac, col4, camera)
        b = binning.bin_gaussians(
            g, grid_x, grid_y, raster_cfg.max_pairs, raster_cfg.chunk, raster_cfg.max_padded
        )
        return b.num_pairs.astype(jnp.float32) + b.tile_start.sum().astype(jnp.float32)

    stage("preprocess+bin", f_bin, centers)

    # --- gather fwd ---
    def f_gather(i, o):
        pd = binning.gather_pair_data(g4._replace(opacity=o + i * 0.0), binned)
        return pd.sum()

    stage("gather_fwd", f_gather, opac)

    # --- gather bwd (cumsum-based VJP) ---
    def f_gather_bwd(i, o):
        def f(oo):
            pd = binning.gather_pair_data(g4._replace(opacity=oo), binned)
            return pd.sum()

        l, gr = jax.value_and_grad(f)(o + i * 0.0)
        return l + gr.sum()

    stage("gather_fwdbwd", f_gather_bwd, opac)

    # --- blend fwd alone (pallas, channels=4) ---
    def f_blend(i, pd):
        out, ft, nc = blend_tiles_pallas(
            pd + i * 0.0, binned.tile_start, binned.tile_nchunks,
            grid_x, grid_y, W, H, raster_cfg.chunk, 4,
        )
        return out.sum() + ft.sum()

    stage("blend_fwd", f_blend, pair_data)

    # --- blend fwd+bwd alone ---
    def f_blend_fb(i, pd):
        def f(p):
            out, ft, nc = blend_tiles_pallas(
                p, binned.tile_start, binned.tile_nchunks,
                grid_x, grid_y, W, H, raster_cfg.chunk, 4,
            )
            return out.sum() + ft.sum()

        l, gr = jax.value_and_grad(f)(pd + i * 0.0)
        return l + gr.sum()

    stage("blend_fwdbwd", f_blend_fb, pair_data)

    # --- assemble tiles -> image ---
    color_t4 = jnp.zeros((grid_x * grid_y, 256, 4), jnp.float32)

    def f_assemble(i, ct):
        img = blend_jax.assemble_image(ct + i * 0.0, grid_x, grid_y, W, H)
        return img.sum()

    stage("assemble_image", f_assemble, color_t4)

    # --- full fused render fwd / fwd+bwd ---
    def f_render(i, pts):
        p = dataclasses.replace(params, points=pts + i * 0.0)
        img, dpt, _ = sugar.render_rgbd(
            p, config, camera, bg=cfg.bg_color, sh_deg=2,
            max_depth=cfg.max_depth, raster_config=raster_cfg,
        )
        return img.sum() + dpt.sum()

    stage("render_rgbd_fwd", f_render, params.points)

    def f_render_fb(i, pts):
        def f(pp):
            p = dataclasses.replace(params, points=pp)
            img, dpt, _ = sugar.render_rgbd(
                p, config, camera, bg=cfg.bg_color, sh_deg=2,
                max_depth=cfg.max_depth, raster_config=raster_cfg,
            )
            return img.sum() * 1e-3 + dpt.sum() * 1e-6

        l, gr = jax.value_and_grad(f)(pts + i * 0.0)
        return l + gr.sum()

    stage("render_rgbd_fwdbwd", f_render_fb, params.points)

    # --- image losses (SSIM + L1 + depth/mask) fwd+bwd w.r.t. images ---
    def f_imgloss(i, im, dp):
        def f(a, b):
            r = masked_rgb_loss(a, gt, mask, 0.2)
            fgm = (gt_depth < cfg.max_depth).astype(jnp.float32)
            d = jnp.abs(b - gt_depth) * fgm
            return r + 0.1 * d.mean()

        l, gr = jax.value_and_grad(f, argnums=(0, 1))(im + i * 0.0, dp)
        return l + gr[0].sum() + gr[1].sum()

    stage("image_losses_fwdbwd", f_imgloss, img0, depth0)

    # --- mesh losses fwd+bwd ---
    from gaustar_tpu.ops import losses as L

    def f_mesh(i, pts):
        def f(v):
            verts = v
            faces = config.faces
            nc = L.mesh_normal_consistency_loss(
                verts, faces, data.adj_faces, config.face_gather, data.adj_gather
            )
            e = L.mesh_edge_isometry_loss_faces(
                verts, faces, data.face_edge_ref, data.face_edge_w, config.face_gather
            )
            a = L.mesh_area_isometry_loss(verts, faces, data.ref_area, config.face_gather)
            return 0.5 * nc + 1000.0 * e + 1000.0 * a

        l, gr = jax.value_and_grad(f)(pts + i * 0.0)
        return l + gr.sum()

    stage("mesh_losses_fwdbwd", f_mesh, params.points)

    def f_mesh_plain(i, pts):
        def f(v):
            nc = L.mesh_normal_consistency_loss(v, config.faces, data.adj_faces)
            e = L.mesh_edge_isometry_loss(v, data.edges, data.ref_edge_len)
            a = L.mesh_area_isometry_loss(v, config.faces, data.ref_area)
            return 0.5 * nc + 1000.0 * e + 1000.0 * a

        l, gr = jax.value_and_grad(f)(pts + i * 0.0)
        return l + gr.sum()

    stage("x_mesh_losses_plain_fwdbwd", f_mesh_plain, params.points)

    # --- targeted backward sub-stages (run: python examples/profile_step.py x_) ---
    def f_prep_fb(i, m):
        def f(mm):
            g = preprocess(mm, cov3d, opac, col4, camera)
            return g.mean2d.sum() + g.conic.sum() + g.depth.sum() + g.color.sum()

        l, gr = jax.value_and_grad(f)(m + i * 0.0)
        return l + gr.sum()

    stage("x_preprocess_fwdbwd", f_prep_fb, centers)

    def f_prim_fb(i, pts):
        def f(pp):
            p = dataclasses.replace(params, points=pp)
            c = sugar.gaussian_centers(p, config)
            cv = sugar.cov3d(p, config)
            return c.sum() + cv.sum()

        l, gr = jax.value_and_grad(f)(pts + i * 0.0)
        return l + gr.sum()

    stage("x_primitives_fwdbwd", f_prim_fb, params.points)

    def f_color_fb(i, pts):
        def f(pp):
            p = dataclasses.replace(params, points=pp)
            pos = sugar.gaussian_centers(p, config)
            rgb = sugar.points_rgb(p, pos, camera.camera_center, 2)
            return rgb.sum()

        l, gr = jax.value_and_grad(f)(pts + i * 0.0)
        return l + gr.sum()

    stage("x_sh_color_fwdbwd", f_color_fb, params.points)

    src16 = jnp.zeros((centers.shape[0], 16), jnp.float32)

    def f_perm_fb(i, s):
        def f(ss):
            return (ss[binned.depth_order] * 2.0).sum()

        l, gr = jax.value_and_grad(f)(s + i * 0.0)
        return l + gr.sum()

    stage("x_permute600k_fwdbwd", f_perm_fb, src16)

    def f_assemble_fb(i, ct):
        def f(cc):
            img = blend_jax.assemble_image(cc, grid_x, grid_y, W, H)
            return img.sum()

        l, gr = jax.value_and_grad(f)(ct + i * 0.0)
        return l + gr.sum()

    stage("x_assemble_fwdbwd", f_assemble_fb, color_t4)

    def f_gather_full_fb(i, o):
        def f(oo):
            gg = g4._replace(
                opacity=oo,
                mean2d=g4.mean2d + oo[:1].sum() * 0.0,
            )
            pd = binning.gather_pair_data(gg, binned)
            return (pd * 1.0000001).sum()

        l, gr = jax.value_and_grad(f)(o + i * 0.0)
        return l + gr.sum()

    stage("x_gatherfull_fwdbwd", f_gather_full_fb, opac)

    # --- full loss fwd+bwd (one camera) ---
    n_g = params.scales.shape[0]
    uw = jnp.zeros((n_g,), jnp.float32)
    pre = params.sh_dc[:, 0, :] * 0.0

    def f_full(i, pts):
        def f(pp):
            p = dataclasses.replace(params, points=pp)
            loss, _ = compute_losses(p, config, data, 0, i, cfg, raster_cfg, 2, uw, pre)
            return loss

        l, gr = jax.value_and_grad(f)(pts + i * 0.0)
        return l + gr.sum()

    stage("full_loss_fwdbwd", f_full, params.points)

    # --- adam ---
    from gaustar_tpu.train.optimizer import OptimizationParams, make_sugar_optimizer
    import optax

    optimizer = make_sugar_optimizer(OptimizationParams(), 1.0)
    opt_state = optimizer.init(params)
    grads = jax.tree.map(jnp.zeros_like, params)

    def f_adam(i, pts):
        g2 = dataclasses.replace(grads, points=grads.points + i * 0.0)
        updates, _ = optimizer.update(g2, opt_state, params)
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(updates))

    stage("adam_update", f_adam, params.points)

    print("---")
    for k, v in stages.items():
        print(f"{k:28s} {v*1e3:9.2f} ms")


if __name__ == "__main__":
    main()
