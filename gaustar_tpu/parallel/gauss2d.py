"""2D ("cam", "gauss") mesh training: camera data parallelism composed with
gaussian-axis MODEL parallelism — the full training path.

The reference has no distributed execution at all (SURVEY §2.1); this is the
repo's own north-star design (BASELINE.md, SURVEY §5). parallel/gauss_shard.py
prototyped the forward collective chain; this module makes it TRAIN:

Per device at mesh coordinate (c, g), D_g = gauss-axis size:

  1. params: `points` (mesh vertices) replicated; every per-gaussian leaf
     (scales/complex2d/densities/sh/deltas) and `config.faces` sharded over
     "gauss" by whole faces. SuGaR primitives (centers/frames/covariance/SH)
     run on the local shard only — 1/D_g of the elementwise work.
  2. local (gaussian, tile) pair expansion; pair KEYS (tile, depth, global id)
     and the per-GAUSSIAN blend fields are all_gather'd over "gauss" (O(N*F) +
     O(pairs*3) bytes — per-gaussian fields, not per-pair fields).
  3. one 3-key lexicographic sort reproduces the exact CUDA pair order
     (rasterizer_impl.cu:277-303), then a G-aligned segment scatter (the
     binning.py layout) so the PRODUCTION Pallas blend kernels run unchanged.
  4. device (c, g) blends a strip of ceil(T/D_g) tiles (tile_base offset into
     blend_tiles_pallas_base) — the pixel-proportional stage scales 1/D_g.
  5. strips all_gather over "gauss" into the full image; the full refine loss
     stack (refine.compute_losses math via losses_after_render) is computed
     per device, scaled 1/D_g (each gauss row computes it redundantly, so the
     cross-device cotangent sums reproduce the exact single-device gradient).
  6. collectives on the grads: `points` psum over "gauss" (its render path is
     per-shard partial; the redundant mesh losses were pre-scaled 1/D_g), all
     leaves pmean over "cam" (camera DP averaging); Adam applied under jit
     with shardings propagated from the shard_map outputs.

Gradient correctness is asserted against the single-device step by
tests/test_gauss2d.py (2x4 mesh vs jax.grad of compute_losses).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gaustar_tpu.cameras import Camera, index_camera
from gaustar_tpu.models import sugar
from gaustar_tpu.ops import blend_jax
from gaustar_tpu.ops.projection import TILE, preprocess
from gaustar_tpu.ops.rasterizer import RasterConfig
from gaustar_tpu.train import refine
from gaustar_tpu.train.refine import FrameData, RefineConfig


def assert_shardable(config: sugar.SuGaRConfig, d_gauss: int):
    f = config.faces.shape[0]
    assert f % d_gauss == 0, (
        f"gauss2d: face count {f} must divide the gauss-axis size {d_gauss} "
        "(pad or decimate the mesh; padded gaussians would bias the reg-loss "
        "means, so padding is not done implicitly)"
    )


def _params_specs(gauss_axis: str) -> sugar.SuGaRParams:
    g = P(gauss_axis)
    return sugar.SuGaRParams(
        points=P(), scales=g, complex2d=g, densities=g,
        sh_dc=g, sh_rest=g, delta_t=g, delta_r=g,
    )


def _config_specs(config: sugar.SuGaRConfig, gauss_axis: str) -> sugar.SuGaRConfig:
    return sugar.SuGaRConfig(
        faces=P(gauss_axis), bary=P(), thickness=P(),
        n_gaussians_per_face=config.n_gaussians_per_face,
        sh_levels=config.sh_levels,
        min_scale=config.min_scale, max_scale=config.max_scale,
        loose_bind=config.loose_bind,
    )


def _data_specs(data: FrameData, cam_axis: str) -> FrameData:
    c = P(cam_axis)
    cam_sharded = type(data.cameras)(
        R=c, T=c, fx=c, fy=c, cx=c, cy=c,
        width=data.cameras.width, height=data.cameras.height,
        znear=data.cameras.znear, zfar=data.cameras.zfar,
    )
    opt = lambda x: P() if x is not None else None
    return FrameData(
        cameras=cam_sharded, gt_images=c, gt_depths=c, margins=c,
        ref_edge_len=P(), ref_area=P(), edges=P(), adj_faces=P(),
        face_edge_ref=opt(data.face_edge_ref), face_edge_w=opt(data.face_edge_w),
    )


def _expand_pairs_local(g, grid_x: int, grid_y: int, cap_local: int):
    """Local (gaussian, tile) pair expansion (gauss_shard.py design; global
    order is fixed later by the 3-key sort)."""
    n = g.mean2d.shape[0]
    n_tiles = grid_x * grid_y
    touched = g.tiles_touched.astype(jnp.int32)
    rect_code = (
        g.rect_min[:, 0]
        | (g.rect_min[:, 1] << 10)
        | ((g.rect_max[:, 0] - g.rect_min[:, 0]) << 20)
    ).astype(jnp.int32)

    offsets = jnp.cumsum(touched) - touched
    total = offsets[-1] + touched[-1]

    p = jnp.arange(cap_local, dtype=jnp.int32)
    gi = jnp.clip(
        jnp.searchsorted(offsets, p, side="right", method="sort").astype(jnp.int32) - 1,
        0, n - 1,
    )
    k = p - offsets[gi]
    code = rect_code[gi]
    rx0 = code & 0x3FF
    ry0 = (code >> 10) & 0x3FF
    rw = jnp.maximum(code >> 20, 1)
    dy = k // rw
    dx = k - dy * rw
    tile = (ry0 + dy) * grid_x + (rx0 + dx)
    valid = p < total
    tile = jnp.where(valid, tile, n_tiles).astype(jnp.int32)
    depth = jnp.where(valid, g.depth[gi], jnp.inf).astype(jnp.float32)
    return tile, depth, gi, total


def render_strip_sharded(
    g2d,
    camera: Camera,
    raster_cfg: RasterConfig,
    d_gauss: int,
    gauss_axis: str,
    channels: int,
):
    """The collective render chain for one camera on one gauss-row of the mesh.

    Returns (img [H, W, C] with NO background, final_T [H, W], num_pairs []) —
    full-frame (strips all_gather'd), identical on every gauss-row device."""
    W, H = camera.width, camera.height
    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE
    n_tiles = grid_x * grid_y
    chunk = raster_cfg.chunk
    cap_local = raster_cfg.max_pairs // d_gauss
    cap_g = raster_cfg.max_padded or (raster_cfg.max_pairs + n_tiles * (chunk - 1))

    di = jax.lax.axis_index(gauss_axis)
    n_local = g2d.mean2d.shape[0]
    n_global = n_local * d_gauss

    tile, depth, gi_local, total_local = _expand_pairs_local(
        g2d, grid_x, grid_y, cap_local
    )
    gid = jnp.where(tile < n_tiles, gi_local + di * n_local, n_global).astype(jnp.int32)

    # Per-gaussian blend fields [n_local, nf]; gathered to [N, nf]. Padded to
    # NFIELDS rows later by the pair scatter.
    src = jnp.concatenate(
        [g2d.mean2d, g2d.conic, g2d.opacity[:, None], g2d.color], axis=-1
    )

    tile_all = jax.lax.all_gather(tile, gauss_axis, tiled=True)  # [D*capL]
    depth_all = jax.lax.all_gather(depth, gauss_axis, tiled=True)
    gid_all = jax.lax.all_gather(gid, gauss_axis, tiled=True)
    src_all = jax.lax.all_gather(src, gauss_axis, tiled=True)  # [N, nf]

    # Exact CUDA pair order: (tile, depth, gaussian id) lexicographic.
    tile_s, _d, gid_s = jax.lax.sort(
        (tile_all, depth_all, gid_all), num_keys=3, is_stable=False
    )

    # Per-tile segments + G-aligned destinations (binning.py layout, so the
    # production Pallas kernels blend unchanged).
    bounds = jnp.searchsorted(
        tile_s, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left", method="sort"
    ).astype(jnp.int32)
    seg_start = bounds[:-1]
    counts = bounds[1:] - seg_start
    padded_counts = ((counts + chunk - 1) // chunk) * chunk
    aligned_start = jnp.cumsum(padded_counts) - padded_counts
    p_all = tile_s.shape[0]
    p_idx = jnp.arange(p_all, dtype=jnp.int32)
    tile_c = jnp.minimum(tile_s, n_tiles - 1)
    dest = jnp.where(
        tile_s < n_tiles,
        aligned_start[tile_c] + (p_idx - seg_start[tile_c]),
        cap_g,
    )

    gid_c = jnp.minimum(gid_s, n_global - 1)
    vals = jnp.where((gid_s < n_global)[:, None], src_all[gid_c], 0.0)  # [P_all, nf]
    nf = vals.shape[1]
    from gaustar_tpu.ops.blend_pallas import NFIELDS

    pair_data = jnp.zeros((cap_g, NFIELDS), jnp.float32)
    pair_data = pair_data.at[dest, :nf].set(vals, mode="drop")
    pair_data = pair_data.T  # [NFIELDS, cap_g] SoA

    # Strip slices (static length ceil(T/D); last strip padded with empty tiles).
    tpd = -(-n_tiles // d_gauss)
    pad_t = tpd * d_gauss - n_tiles
    start_p = jnp.pad(aligned_start, (0, pad_t))
    count_p = jnp.pad(counts, (0, pad_t))
    nch_p = jnp.pad(padded_counts // chunk, (0, pad_t))
    t0 = di * tpd
    start_l = jax.lax.dynamic_slice_in_dim(start_p, t0, tpd)
    count_l = jax.lax.dynamic_slice_in_dim(count_p, t0, tpd)
    nch_l = jax.lax.dynamic_slice_in_dim(nch_p, t0, tpd)

    impl = raster_cfg.resolve_impl()
    if impl == "pallas":
        from gaustar_tpu.ops.blend_pallas import blend_tiles_pallas_base

        color_cp, final_t_l, _nc = blend_tiles_pallas_base(
            pair_data, start_l, nch_l, t0.reshape(1), grid_x, grid_y, W, H,
            chunk, channels,
        )
        color_l = color_cp.transpose(0, 2, 1)  # [tpd, P, C]
    else:
        tiles = blend_jax.blend_tile_range(
            pair_data, start_l, count_l, grid_x, raster_cfg.max_per_tile,
            channels, tile_offset=t0,
        )
        color_l, final_t_l = tiles.color, tiles.final_T

    # Full image: gather the strips over the gauss axis.
    color_t = jax.lax.all_gather(color_l, gauss_axis, tiled=True)[:n_tiles]
    final_t_t = jax.lax.all_gather(final_t_l, gauss_axis, tiled=True)[:n_tiles]
    img = blend_jax.assemble_image(color_t, grid_x, grid_y, W, H)
    final_t = blend_jax.assemble_image(final_t_t[..., None], grid_x, grid_y, W, H)[..., 0]
    num_pairs = jax.lax.psum(total_local, gauss_axis)
    return img, final_t, num_pairs


def _local_loss(
    p_local: sugar.SuGaRParams,
    config_local: sugar.SuGaRConfig,
    config_full: sugar.SuGaRConfig,
    local_data: FrameData,
    cam_idx,
    iteration,
    cfg: RefineConfig,
    raster_cfg: RasterConfig,
    sh_deg: int,
    d_gauss: int,
    gauss_axis: str,
    unbind_weight,
    pre_sh_dc,
):
    """Per-device loss = (full refine loss for this row's camera) / d_gauss.

    Accounting (the 1/d_gauss makes the per-device SUM over the gauss axis
    equal the true loss, so the collective-transposed gradients are exact):
      - pixel losses: computed identically on every gauss-row device from the
        all_gather'd full image (redundant; sums to 1x);
      - mesh losses: full verts (replicated points) x full faces (config_full),
        identical per device (redundant; sums to 1x; the 1/d_gauss-scaled
        per-device `points` partial is completed by the psum in grad_shard);
      - per-gaussian reg losses (sh_reg / opacity / unbind): each device's
        losses_after_render sees only its SHARD, so its "mean" is a shard mean;
        with equal shards, sum_g (1/D) * mean_shard = global mean, and the
        per-coefficient gradient is exactly 1/N — identical to single-device.
    """
    camera = index_camera(local_data.cameras, cam_idx)

    # Fused RGBD primitives on the LOCAL gaussian shard (one shared gather).
    positions, cov = sugar.geom_primitives(p_local, config_local)
    rgb = sugar.points_rgb(p_local, positions, camera.camera_center, sh_deg)
    view = camera.view
    z = positions @ view[2, :3] + view[2, 3]
    colors4 = jnp.concatenate([rgb, z[:, None]], axis=-1)
    opac = sugar.strengths(p_local)
    g2d = preprocess(positions, cov, opac, colors4, camera)

    img4, final_t, num_pairs = render_strip_sharded(
        g2d, camera, raster_cfg, d_gauss, gauss_axis, channels=4
    )
    bg4 = jnp.asarray((*cfg.bg_color, cfg.max_depth), jnp.float32)
    img4 = img4 + final_t[..., None] * bg4
    img = img4[..., :3]
    pred_depth = img4[..., 3]

    loss, loss_dict = refine.losses_after_render(
        p_local, config_full, local_data, cam_idx, iteration, cfg,
        img, pred_depth, unbind_weight, pre_sh_dc,
    )
    loss_dict["num_pairs"] = num_pairs
    return loss / d_gauss, loss_dict


def make_gauss2d_train_step(
    model_config: sugar.SuGaRConfig,
    data: FrameData,
    cfg: RefineConfig,
    raster_cfg: RasterConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    cam_axis: str = "cam",
    gauss_axis: str = "gauss",
):
    """Returns make_step(sh_deg) -> jitted 2D-sharded train step.

    step(params, opt_state, cam_idx [D_cam, 1], iteration, unbind_weight,
    pre_sh_dc) -> (params, opt_state, loss, caps). `params` must be pre-padded
    with shard_sugar(params, config, mesh.shape[gauss_axis]); per-gaussian
    leaves shard over the gauss axis, `points` stays replicated."""
    d_gauss = mesh.shape[gauss_axis]
    assert_shardable(model_config, d_gauss)
    # Static gather tables (ops/segment.py) are a single-device backward
    # optimization; under gauss-sharding faces are sharded, so strip them and
    # let the sharded path use the plain gather (matches the spec pytrees).
    model_config = dataclasses.replace(model_config, face_gather=None)
    data = data._replace(adj_gather=None)
    p_specs = _params_specs(gauss_axis)
    c_specs = _config_specs(model_config, gauss_axis)
    c_full_specs = _config_specs(model_config, gauss_axis)
    c_full_specs = dataclasses.replace(c_full_specs, faces=P())
    d_specs = _data_specs(data, cam_axis)

    def make_step(sh_deg: int):
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(p_specs, c_specs, c_full_specs, d_specs, P(cam_axis), P(),
                      P(gauss_axis), P(gauss_axis)),
            out_specs=(P(), p_specs, P()),
            check_vma=False,
        )
        def grad_shard(params, config_l, config_f, local_data, cam_idx, iteration, uw, pre):
            def loss_fn(p):
                return _local_loss(
                    p, config_l, config_f, local_data, cam_idx[0, 0], iteration, cfg,
                    raster_cfg, sh_deg, d_gauss, gauss_axis, uw, pre,
                )

            (loss, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            # points: per-shard render partials + (1/D_g-scaled) redundant mesh
            # losses -> psum over gauss completes both. Everything then averages
            # over cameras.
            grads = dataclasses.replace(
                grads, points=jax.lax.psum(grads.points, gauss_axis)
            )
            grads = jax.lax.pmean(grads, cam_axis)
            loss = jax.lax.pmean(jax.lax.psum(loss, gauss_axis), cam_axis)
            caps = jax.lax.pmax(
                jax.lax.pmax(ld["num_pairs"], gauss_axis), cam_axis
            )
            return loss, grads, caps

        # `data`/config ride as jit ARGUMENTS (closure arrays bake into the
        # remote compile payload — HTTP 413 at reference scale, train/refine.py).
        @jax.jit
        def _step(params, opt_state, mcfg, fdata, cam_idx, iteration, unbind_weight, pre_sh_dc):
            loss, grads, caps = grad_shard(
                params, mcfg, mcfg, fdata, cam_idx, iteration,
                unbind_weight, pre_sh_dc,
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, {"num_pairs": caps}

        def step(params, opt_state, cam_idx, iteration, unbind_weight, pre_sh_dc):
            return _step(
                params, opt_state, model_config, data, cam_idx, iteration,
                unbind_weight, pre_sh_dc,
            )

        return step

    return make_step
