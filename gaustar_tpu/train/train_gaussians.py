"""Vanilla 3DGS training loop — gaussian_splatting/train.py equivalent (layer L1).

Random camera per iteration, 0.8*L1 + 0.2*DSSIM, SH degree warmup every 1000
iterations, adaptive density control (clone/split/prune on positional-gradient
stats) with optimizer-moment surgery matching the reference
(sugar_densifier.py:48-128: survivors keep Adam moments, new gaussians start at
zero), opacity reset every 3000 iterations.

On TPU the gaussian count is bucket-padded (see densifier.py) so densification
only retraces the jitted step when a capacity bucket is crossed.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gaustar_tpu.cameras import Camera, index_camera
from gaustar_tpu.models import gaussians
from gaustar_tpu.models.gaussians import GaussianParams
from gaustar_tpu.ops import losses
from gaustar_tpu.ops.rasterizer import RasterConfig
from gaustar_tpu.train import densifier
from gaustar_tpu.train.optimizer import OptimizationParams
from gaustar_tpu.utils.general import get_expon_lr_func


@dataclasses.dataclass(frozen=True)
class GSTrainConfig:
    iterations: int = 7000
    sh_degree: int = 2
    sh_warmup_every: int = 1000
    lambda_dssim: float = 0.2
    bg_color: tuple = (0.0, 0.0, 0.0)
    densify_from_iter: int = 500
    densify_until_iter: int = 7000
    densification_interval: int = 200
    densify_grad_threshold: float = 0.0002
    prune_opacity_threshold: float = 0.005
    densify_screen_size_threshold: float = 20.0
    percent_dense: float = 0.01
    opacity_reset_interval: int = 3000
    bucket: int = 4096


def make_optimizer(opt: OptimizationParams, spatial_lr_scale: float):
    pos_schedule = get_expon_lr_func(
        lr_init=opt.position_lr_init * spatial_lr_scale,
        lr_final=opt.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt.position_lr_delay_mult,
        max_steps=opt.position_lr_max_steps,
    )

    def adam(lr):
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-15)

    transforms = {
        "xyz": adam(pos_schedule),
        "features_dc": adam(opt.feature_lr),
        "features_rest": adam(opt.feature_lr / 20.0),
        "scaling": adam(opt.scaling_lr),
        "rotation": adam(opt.rotation_lr),
        "opacity": adam(opt.opacity_lr),
    }
    labels = GaussianParams(
        xyz="xyz",
        features_dc="features_dc",
        features_rest="features_rest",
        scaling="scaling",
        rotation="rotation",
        opacity="opacity",
    )
    return optax.multi_transform(transforms, labels)


def surgery_opt_state(opt_state, n_old: int, keep_mask: np.ndarray, n_new: int):
    """Adam-moment surgery across a densify event: leaves with leading dim n_old
    keep surviving rows and zero-fill to n_new (sugar_densifier.py:48-128)."""

    def fix(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == n_old:
            kept = np.asarray(leaf)[keep_mask]
            pad = np.zeros((n_new - len(kept), *leaf.shape[1:]), np.asarray(leaf).dtype)
            return jnp.asarray(np.concatenate([kept, pad]))
        return leaf

    return jax.tree_util.tree_map(fix, opt_state)


def train_gaussians(
    params: GaussianParams,
    cameras: Camera,  # batched
    gt_images,  # [C, H, W, 3]
    cfg: GSTrainConfig = GSTrainConfig(),
    raster_cfg: RasterConfig = RasterConfig(),
    opt_params: OptimizationParams | None = None,
    spatial_lr_scale: float = 1.0,
    seed: int = 0,
    log_fn: Callable | None = None,
):
    """Full 3DGS optimization. Returns (params, history)."""
    opt_params = opt_params or OptimizationParams(iterations=cfg.iterations)
    optimizer = make_optimizer(opt_params, spatial_lr_scale)
    opt_state = optimizer.init(params)
    dstate = densifier.init_state(gaussians.n_points(params))

    @jax.jit
    def grad_step(params, opt_state, dstate, cam_idx, sh_deg_arr):
        # sh_deg folded in as data: rendered colors use full features but zeroed
        # bands above the active degree (identical math to degree clamping).
        camera = index_camera(cameras, cam_idx)

        def loss_fn(p, dummy):
            # SH warmup by zeroing bands above the active degree (identical math
            # to evaluating at a lower degree, but jit-stable in one trace).
            k = p.features_rest.shape[1] + 1
            idx = jnp.arange(1, k)
            deg_of = jnp.floor(jnp.sqrt(idx.astype(jnp.float32))).astype(jnp.int32)
            mask = (deg_of <= sh_deg_arr).astype(jnp.float32)[None, :, None]
            p2 = dataclasses.replace(p, features_rest=p.features_rest * mask)
            img, aux = gaussians.render(
                p2, camera, bg=cfg.bg_color, raster_config=raster_cfg, means2d_dummy=dummy
            )
            gt = gt_images[cam_idx]
            l1 = losses.l1_loss(img, gt)
            ssim_v = losses.ssim(img, gt)
            loss = (1.0 - cfg.lambda_dssim) * l1 + cfg.lambda_dssim * (1.0 - ssim_v)
            return loss, aux.radii

        dummy = jnp.zeros((params.xyz.shape[0], 2))
        (loss, radii), grads = jax.value_and_grad(
            lambda p, d: loss_fn(p, d), argnums=(0, 1), has_aux=True
        )(params, dummy)
        pgrads, dgrad = grads
        dstate = densifier.update_stats(dstate, dgrad, radii)
        updates, opt_state = optimizer.update(pgrads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, dstate, loss

    n_cams = gt_images.shape[0]
    rng = np.random.default_rng(seed)
    order = rng.permutation(n_cams)
    cursor = 0
    history = []
    extent = spatial_lr_scale

    for it in range(1, cfg.iterations + 1):
        if cursor >= n_cams:
            order = rng.permutation(n_cams)
            cursor = 0
        cam_idx = int(order[cursor])
        cursor += 1
        sh_deg = min((it - 1) // cfg.sh_warmup_every, cfg.sh_degree)

        params, opt_state, dstate, loss = grad_step(
            params, opt_state, dstate, jnp.int32(cam_idx), jnp.int32(sh_deg)
        )

        if (
            cfg.densify_from_iter < it < cfg.densify_until_iter
            and (it + 1) % cfg.densification_interval == 0
        ):
            n_old = gaussians.n_points(params)
            params, dstate, info = densifier.densify_and_prune(
                params,
                dstate,
                max_grad=cfg.densify_grad_threshold,
                min_opacity=cfg.prune_opacity_threshold,
                extent=extent,
                max_screen_size=(
                    cfg.densify_screen_size_threshold if it > cfg.opacity_reset_interval else None
                ),
                percent_dense=cfg.percent_dense,
                bucket=cfg.bucket,
                seed=seed + it,
            )
            # survivors keep Adam moments; clones/splits/pad start at zero
            opt_state = surgery_opt_state(
                opt_state, n_old, info["keep_mask"], gaussians.n_points(params)
            )
            if log_fn:
                log_fn({"iteration": it, "event": "densify", **{
                    k: v for k, v in info.items() if k != "keep_mask"}})

        if it % cfg.opacity_reset_interval == 0:
            params = densifier.reset_opacity(params)

        if it % 100 == 0:
            history.append({"iteration": it, "loss": float(loss)})
            if log_fn:
                log_fn(history[-1])

    return params, history
