"""Per-frame refinement loop — the hot training loop of GauSTAR.

TPU re-design of gaustar_trainers/refine.py:39-866: the full loss stack of one
iteration is a single jitted function (rendered twice: RGB + depth-as-color),
the host loop only shuffles cameras and handles the one-time unbind event.

Loss stack (refine.py:584-748, weights from opti_config :24-37 and
train_seq.py:107-118):
  rgb      0.8*L1 + 0.2*DSSIM on margin-cropped images, green bg (refine.py:456)
  depth    0.1 * L1 on foreground (gt_depth < max_depth), 2nd rasterizer pass
           with view-space z as color, bg = max_depth
  mask     1.0 * L1 pulling background rendered depth to max_depth
  sh_reg   1.0 * L2 between current and previous-frame dc SH (if enabled)
  nc       0.5 * mesh normal consistency
  edge_iso factor * (edge_len - ref_len)^2        (frame 0 only)
  area_iso factor * |face_area - ref_area|
  unbind   100 * w*|delta_t| + 1 * w*|delta_r.xyz|  (once loose-bound)
  opacity  relu(0.8 - opacity).mean()

Margin crops are realized as masks with masked means (static shapes under jit);
for margins >= the SSIM window half-width (5 px) this is numerically identical
to the reference's dynamic crop because cropping zero-pads the conv anyway.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gaustar_tpu.cameras import Camera, index_camera
from gaustar_tpu.models import sugar
from gaustar_tpu.ops import losses
from gaustar_tpu.ops import sh as _sh
from gaustar_tpu.ops.rasterizer import RasterConfig
from gaustar_tpu.train.optimizer import OptimizationParams, make_sugar_optimizer


@dataclasses.dataclass(frozen=True)
class RefineConfig:
    """Hyperparameters of refined_training (refine.py:24-163 + opti_config)."""

    num_iterations: int = 2000
    sh_levels: int = 3
    bg_color: tuple = (0.0, 1.0, 0.0)  # green screen (refine.py:456)
    dssim_factor: float = 0.2
    use_margin: bool = True
    depth_loss_factor: float = 0.1
    depth_loss_from: int = 0
    mask_loss_factor: float = 1.0
    mask_loss_from: int = 0
    max_depth: float = 10.0
    sh_reg_loss_factor: float = 1.0
    use_sh_reg: bool = False
    normal_consistency_factor: float = 0.5
    edge_iso_factor: float = 1000.0
    edge_iso_from: int = 0  # 999999 on later frames (train_seq.py:94-97 semantics)
    area_iso_factor: float = 1000.0  # 5000 on frame 0
    area_iso_from: int = 0
    # Default-off knobs carried from the reference (refine.py:117-122,143-144):
    use_laplacian_smoothing: bool = False
    laplacian_smoothing_factor: float = 5.0  # refine.py:122 ("uniform" method)
    area_reg_loss_factor: float = 0.1
    area_reg_from: int = 999999  # refine.py:144 (inactive by default)
    use_opacity_reg: bool = True
    min_opacity: float = 0.8
    loose_bind_from: int = 1000
    loose_bind_factor_t: float = 100.0
    loose_bind_factor_r: float = 1.0
    unbind_threshold: int = 100  # min fully-flagged gaussians to loose-bind (refine.py:720-737)
    do_sh_warmup: bool = True
    # Traced hyperparameters (compile-reuse mode, used with face bucketing —
    # train/bucketing.py): the knobs that differ across frames / the
    # post-update re-refine (SH warmup interval, edge-iso threshold, area-iso
    # factor, sh-reg on/off, per-group learning rates incl. the exp position
    # schedule) become TRACED step inputs instead of baked constants, so one
    # compiled program serves num_iterations=2000 and =1000, frame-0 and later
    # frames, and every mesh whose face count shares a bucket. Values and
    # gradients are identical (the constants just arrive via arguments).
    traced_hparams: bool = False
    # Multi-camera batch lowering: "unroll" re-traces compute_losses per camera
    # (XLA CSE shares the camera-independent subgraphs; compile grows ~linearly
    # in B), "scan" is a lax.scan with hoisted geometry/mesh losses (flat
    # compile; the right choice at B >= ~4). Values/grads identical.
    batch_impl: str = "unroll"


class FrameData(NamedTuple):
    """Per-frame training data, device-resident."""

    cameras: Camera  # batched (leading axis C)
    gt_images: Any  # [C, H, W, 3] float32, bg composited green (cameras.py:192-196)
    gt_depths: Any  # [C, H, W] float32, invalid/background >= max_depth
    margins: Any  # [C, 4] int32 (left, right, top, bottom), >= 1 (refine.py:255-270)
    ref_edge_len: Any  # [E]
    ref_area: Any  # [F]
    edges: Any  # [E, 2] int32 (topology of the bound mesh)
    adj_faces: Any  # [E_int, 2] int32
    # Optional fused edge-iso tables (losses.face_edge_tables): when present,
    # the edge-iso loss rides the shared verts[faces] gather instead of its own
    # verts[edges] gather + backward scatter (~7 ms/step at reference scale).
    face_edge_ref: Any = None  # [F, 3]
    face_edge_w: Any = None  # [F, 3]
    # Optional static backward tables for the normals[adj_faces] gather
    # (ops/segment.py): segment-sum VJP instead of a scatter-add.
    adj_gather: Any = None  # (order [2*E_int], offsets [F+1])
    # Optional [E_int] 0/1 mask of real adjacency rows (face bucketing pads
    # adj_faces with [0, 0] rows; see train/bucketing.py).
    adj_mask: Any = None


class TracedGates(NamedTuple):
    """Per-frame refine knobs as TRACED scalars (see RefineConfig.traced_hparams).
    Built by make_train_step from the static RefineConfig; two configs that
    differ only in these values lower to the SAME program."""

    sh_every: Any  # int32: SH warmup interval (num_iterations // 4)
    edge_from: Any  # int32: edge-iso activation threshold (0 or 999999)
    area_factor: Any  # f32: area-iso factor (5000 frame 0, 1000 later)
    sh_reg_w: Any  # f32: sh-reg weight (0 = off)

    @staticmethod
    def from_config(cfg: "RefineConfig") -> "TracedGates":
        return TracedGates(
            sh_every=jnp.int32(max(cfg.num_iterations // 4, 1)),
            edge_from=jnp.int32(min(cfg.edge_iso_from, 2**31 - 1)),
            area_factor=jnp.float32(cfg.area_iso_factor),
            sh_reg_w=jnp.float32(cfg.sh_reg_loss_factor if cfg.use_sh_reg else 0.0),
        )


def with_face_edge_tables(data: "FrameData", faces) -> "FrameData":
    """Attach the fused edge-iso tables derived from the frame's topology, and
    the normals[adj_faces] backward tables (ops/segment.py)."""
    from gaustar_tpu.ops.segment import gather_tables

    ref, w = losses.face_edge_tables(
        np.asarray(faces), np.asarray(data.edges), np.asarray(data.ref_edge_len)
    )
    import jax.numpy as _jnp

    return data._replace(
        face_edge_ref=_jnp.asarray(ref),
        face_edge_w=_jnp.asarray(w),
        adj_gather=gather_tables(np.asarray(data.adj_faces), len(np.asarray(faces))),
    )


def compute_margins(cx, cy, width, height) -> np.ndarray:
    """Per-camera crop margins from the principal point (refine.py:255-270)."""
    c = len(np.atleast_1d(cx))
    m = np.ones((c, 4), np.int32)
    cx = np.atleast_1d(np.asarray(cx))
    cy = np.atleast_1d(np.asarray(cy))
    for i in range(c):
        if cx[i] < width / 2:
            m[i, 0] = int(width / 2 - cx[i]) + 1
        else:
            m[i, 1] = int(cx[i] - width / 2) + 1
        if cy[i] < height / 2:
            m[i, 2] = int(height / 2 - cy[i]) + 1
        else:
            m[i, 3] = int(cy[i] - height / 2) + 1
    return m


def margin_mask(margin, height: int, width: int) -> jnp.ndarray:
    """[H, W] 0/1 mask excluding the crop margins (left, right, top, bottom)."""
    xs = jnp.arange(width)
    ys = jnp.arange(height)
    mx = (xs >= margin[0]) & (xs < width - margin[1])
    my = (ys >= margin[2]) & (ys < height - margin[3])
    return (my[:, None] & mx[None, :]).astype(jnp.float32)


def masked_mean(x, mask):
    return (x * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def masked_rgb_loss(pred, gt, mask, dssim_factor=0.2):
    """0.8*L1 + 0.2*DSSIM over the masked region (see module docstring)."""
    m3 = mask[..., None]
    l1 = masked_mean(jnp.abs(pred - gt), jnp.broadcast_to(m3, pred.shape))
    smap = losses.ssim_map(pred * m3, gt * m3)
    ssim_v = masked_mean(smap, jnp.broadcast_to(m3, smap.shape))
    return (1.0 - dssim_factor) * l1 + dssim_factor * (1.0 - ssim_v)


def masked_rgb_loss_cm(pred_cm, gt_cm, mask, dssim_factor=0.2):
    """masked_rgb_loss in channels-major layout ([C, H, W]); identical value
    (same sums, reassociated) with zero [H,W,C] relayouts on the hot path."""
    m3 = mask[None]
    l1 = masked_mean(jnp.abs(pred_cm - gt_cm), jnp.broadcast_to(m3, pred_cm.shape))
    smap = losses.ssim_map_cm(pred_cm * m3, gt_cm * m3)
    ssim_v = masked_mean(smap, jnp.broadcast_to(m3, smap.shape))
    return (1.0 - dssim_factor) * l1 + dssim_factor * (1.0 - ssim_v)


def compute_losses(
    params: sugar.SuGaRParams,
    model_config: sugar.SuGaRConfig,
    data: FrameData,
    cam_idx,
    iteration,
    cfg: RefineConfig,
    raster_cfg: RasterConfig,
    sh_deg: int,
    unbind_weight=None,
    pre_sh_dc=None,
    sh_band_w=None,
    gates: TracedGates | None = None,
):
    """One iteration's full loss (refine.py:552-748). Differentiable in params.

    `sh_band_w` ([sh_levels] traced per-degree weights) supersedes the static
    `sh_deg`: the SH warmup becomes a traced input so all warmup stages share
    ONE compiled step (see ops/sh.py eval_sh_soa_banded — identical values and
    gradients to static truncation)."""
    camera = index_camera(data.cameras, cam_idx)
    H, W = camera.height, camera.width
    loss_dict = {}

    # --- RGB + depth in ONE fused rasterizer pass (identical blend weights =>
    # identical values/gradients to the reference's two passes; see render_rgbd).
    # Channels-major end to end: the Pallas maps feed the cm loss path with no
    # [H,W,C] round-trip (see pixel_losses layout="cm").
    img, pred_depth, _aux = sugar.render_rgbd(
        params,
        model_config,
        camera,
        bg=cfg.bg_color,
        sh_deg=sh_deg,
        max_depth=cfg.max_depth,
        raster_config=raster_cfg,
        sh_band_w=sh_band_w,
        layout="cm",
    )
    loss, loss_dict = losses_after_render(
        params, model_config, data, cam_idx, iteration, cfg,
        img, pred_depth, unbind_weight, pre_sh_dc, layout="cm", gates=gates,
    )
    # Capacity telemetry: lets the host loop auto-grow the raster config on
    # overflow instead of silently truncating (see refine_frame).
    loss_dict["num_pairs"] = _aux.num_pairs
    loss_dict["num_padded"] = _aux.num_padded
    loss_dict["num_active"] = _aux.num_active
    return loss, loss_dict


def pixel_losses(
    data: FrameData,
    cam_idx,
    iteration,
    cfg: RefineConfig,
    img,
    pred_depth,
    layout: str = "hwc",
):
    """The CAMERA-dependent loss terms (rgb + depth + mask) given a rendered
    (img, pred_depth). Split out so batched steps can scan over cameras while
    computing the camera-independent mesh/reg terms once.

    `layout="cm"` takes img CHANNELS-MAJOR ([3, H, W], the Pallas render's
    native layout): GT transposes once (constant — no backward), the SSIM path
    runs channels-major throughout — two relayouts (plus their cotangent
    counterparts) cheaper per step than the hwc path. Same value (summation
    reassociation only)."""
    camera = index_camera(data.cameras, cam_idx)
    H, W = camera.height, camera.width
    loss_dict = {}

    gt = data.gt_images[cam_idx]
    if layout == "cm":
        gt = gt.transpose(2, 0, 1)
    if cfg.use_margin:
        mask = margin_mask(data.margins[cam_idx], H, W)
        if layout == "cm":
            rgb = masked_rgb_loss_cm(img, gt, mask, cfg.dssim_factor)
        else:
            rgb = masked_rgb_loss(img, gt, mask, cfg.dssim_factor)
    elif layout == "cm":
        f = cfg.dssim_factor
        rgb = (1.0 - f) * losses.l1_loss(img, gt) + f * (
            1.0 - losses.ssim_map_cm(img, gt).mean()
        )
    else:
        rgb = losses.rgb_loss(img, gt, cfg.dssim_factor)
    loss = rgb
    loss_dict["rgb_loss"] = rgb

    # --- depth + mask losses (refine.py:599-660) ---
    depth_on = iteration > cfg.depth_loss_from
    mask_on = iteration > cfg.mask_loss_from
    gt_depth = data.gt_depths[cam_idx]
    fg = (gt_depth < cfg.max_depth).astype(jnp.float32)
    bg = (gt_depth > cfg.max_depth).astype(jnp.float32)
    depth_loss = cfg.depth_loss_factor * masked_mean(jnp.abs(pred_depth - gt_depth), fg)
    mask_loss = cfg.mask_loss_factor * masked_mean(jnp.abs(pred_depth - cfg.max_depth), bg)
    loss = loss + jnp.where(depth_on, depth_loss, 0.0) + jnp.where(mask_on, mask_loss, 0.0)
    loss_dict["depth_loss"] = depth_loss
    loss_dict["mask_loss"] = mask_loss
    return loss, loss_dict


def losses_after_render(
    params: sugar.SuGaRParams,
    model_config: sugar.SuGaRConfig,
    data: FrameData,
    cam_idx,
    iteration,
    cfg: RefineConfig,
    img,
    pred_depth,
    unbind_weight=None,
    pre_sh_dc=None,
    layout: str = "hwc",
    gates: TracedGates | None = None,
):
    """The full refine loss stack GIVEN a rendered (img, pred_depth) — shared
    by the single-device path (compute_losses) and the gaussian-axis sharded
    path (parallel/gauss2d.py), so their loss math is one implementation."""
    loss, loss_dict = pixel_losses(data, cam_idx, iteration, cfg, img, pred_depth, layout)
    s_loss, s_dict = shared_losses(
        params, model_config, data, iteration, cfg, unbind_weight, pre_sh_dc, gates
    )
    loss_dict.update(s_dict)
    return loss + s_loss, loss_dict


def shared_losses(
    params: sugar.SuGaRParams,
    model_config: sugar.SuGaRConfig,
    data: FrameData,
    iteration,
    cfg: RefineConfig,
    unbind_weight=None,
    pre_sh_dc=None,
    gates: TracedGates | None = None,
):
    """The CAMERA-INDEPENDENT loss terms (sh_reg + mesh + unbind + opacity
    regularizers): batched steps compute these ONCE outside the per-camera
    scan/unroll (compute_losses_multi_scan).

    With `gates` (compile-reuse mode) the per-frame knobs arrive as traced
    scalars; with face bucketing (model_config.face_mask) every mean
    normalizes by the REAL element counts, so padded models produce identical
    values/gradients."""
    loss = jnp.float32(0.0)
    loss_dict = {}

    gmask = None
    inv_ng = None
    if model_config.face_mask is not None:
        gmask = sugar.gaussian_mask(model_config)  # [N] 0/1
        inv_ng = 1.0 / jnp.maximum(gmask.sum(), 1.0)

    def gmean(x):
        """Mean over REAL gaussians of a [N, ...] tensor (plain mean unbucketed)."""
        if gmask is None:
            return x.mean()
        extra = float(np.prod(x.shape[1:])) if x.ndim > 1 else 1.0
        m = gmask.reshape((-1,) + (1,) * (x.ndim - 1))
        return (x * m).sum() * inv_ng / extra

    # --- SH regularization to previous frame (refine.py:663-669) ---
    if gates is not None:
        sh_reg = gates.sh_reg_w * gmean((pre_sh_dc - params.sh_dc[:, 0, :]) ** 2)
        loss = loss + sh_reg
        loss_dict["sh_reg_loss"] = sh_reg
    elif cfg.use_sh_reg and pre_sh_dc is not None:
        sh_reg = cfg.sh_reg_loss_factor * gmean((pre_sh_dc - params.sh_dc[:, 0, :]) ** 2)
        loss = loss + sh_reg
        loss_dict["sh_reg_loss"] = sh_reg

    # --- mesh losses (refine.py:678-718) ---
    # All three ride ONE verts[faces] gather (losses.mesh_regularizers), so the
    # backward runs a single per-vertex segment reduction; its VJP uses the
    # static segment-sum tables when present.
    verts, faces = sugar.surface_mesh(params, model_config)
    reg = losses.mesh_regularizers(
        verts,
        faces,
        data.adj_faces,
        data.ref_area,
        face_edge_ref=data.face_edge_ref,
        face_edge_w=data.face_edge_w,
        edges=data.edges,
        ref_edge_len=data.ref_edge_len,
        tables=model_config.face_gather,
        adj_tables=data.adj_gather,
        face_mask=model_config.face_mask,
        adj_mask=data.adj_mask,
    )
    nc = cfg.normal_consistency_factor * reg["nc"]
    loss = loss + nc
    loss_dict["nc_loss"] = nc

    edge_from = gates.edge_from if gates is not None else cfg.edge_iso_from
    edge_on = iteration > edge_from
    edge = cfg.edge_iso_factor * reg["edge"]
    loss = loss + jnp.where(edge_on, edge, 0.0)
    loss_dict["edge_loss"] = edge

    area_factor = gates.area_factor if gates is not None else cfg.area_iso_factor
    area_on = iteration > cfg.area_iso_from
    area = area_factor * reg["area"]
    loss = loss + jnp.where(area_on, area, 0.0)
    loss_dict["area_loss"] = area

    # Default-off reference knobs (refine.py:680-682, 713-718). Statically gated
    # so the default step compiles no extra work.
    if cfg.use_laplacian_smoothing:
        lap = cfg.laplacian_smoothing_factor * losses.mesh_laplacian_smoothing_loss(
            verts, data.edges
        )
        loss = loss + lap
        loss_dict["laplacian_loss"] = lap
    if cfg.area_reg_from < cfg.num_iterations:
        area_reg = cfg.area_reg_loss_factor * losses.mesh_area_reg_loss(verts, faces)
        loss = loss + jnp.where(iteration > cfg.area_reg_from, area_reg, 0.0)
        loss_dict["area_reg_loss"] = area_reg

    # --- unbind regularization (refine.py:738-740) ---
    if model_config.loose_bind and unbind_weight is not None:
        w = unbind_weight[:, None]
        loss = loss + cfg.loose_bind_factor_t * gmean(w * jnp.abs(params.delta_t))
        loss = loss + cfg.loose_bind_factor_r * gmean(w * jnp.abs(params.delta_r[..., 1:]))

    # --- opacity regularization (refine.py:743-748) ---
    if cfg.use_opacity_reg:
        op_reg = gmean(jax.nn.relu(cfg.min_opacity - sugar.strengths(params)))
        loss = loss + op_reg
        loss_dict["opacity_reg"] = op_reg

    return loss, loss_dict


def compute_losses_multi(
    params: sugar.SuGaRParams,
    model_config: sugar.SuGaRConfig,
    data: FrameData,
    cam_idxs,
    iteration,
    cfg: RefineConfig,
    raster_cfg: RasterConfig,
    sh_deg: int,
    unbind_weight=None,
    pre_sh_dc=None,
    sh_band_w=None,
    gates: TracedGates | None = None,
):
    """Mean of compute_losses over a STATIC batch of cameras (cam_idxs [B]).

    TPU-throughput extension beyond the reference's one-camera iteration
    (refine.py:552): the batch is unrolled at trace time, so the
    camera-independent subgraphs (gaussian centers/covariances, mesh + reg
    losses and their backward) are structurally identical HLO across the B
    copies and XLA CSE materializes them once — only preprocess/binning/blend
    scale with B. Equivalent to averaging B single-camera gradients (the
    camera-DP layout's local analog; parallel/sharding.py does the same mean
    across devices). Capacity telemetry (num_pairs/num_padded) reports the MAX
    over the batch so the host auto-retry keys on the worst camera."""
    b_total = None
    b_dict: dict = {}
    n = int(cam_idxs.shape[0])
    for b in range(n):
        loss_b, ld_b = compute_losses(
            params, model_config, data, cam_idxs[b], iteration, cfg, raster_cfg,
            sh_deg, unbind_weight, pre_sh_dc, sh_band_w, gates,
        )
        b_total = loss_b if b_total is None else b_total + loss_b
        for k, v in ld_b.items():
            if k in ("num_pairs", "num_padded", "num_active"):
                b_dict[k] = v if k not in b_dict else jnp.maximum(b_dict[k], v)
            else:
                b_dict[k] = v if k not in b_dict else b_dict[k] + v
    inv = 1.0 / n
    for k in b_dict:
        if k not in ("num_pairs", "num_padded", "num_active"):
            b_dict[k] = b_dict[k] * inv
    return b_total * inv, b_dict


def compute_losses_multi_scan(
    params: sugar.SuGaRParams,
    model_config: sugar.SuGaRConfig,
    data: FrameData,
    cam_idxs,
    iteration,
    cfg: RefineConfig,
    raster_cfg: RasterConfig,
    sh_deg: int,
    unbind_weight=None,
    pre_sh_dc=None,
    sh_band_w=None,
    gates: TracedGates | None = None,
):
    """compute_losses_multi with the camera batch as a lax.scan, not a
    trace-time unroll: compile time and HLO size stay FLAT in B (the unrolled
    form's program grows linearly — full-step compile is already ~6 min over
    the axon tunnel, so B=8-16 per device is only reachable this way).

    The camera-INDEPENDENT work is hoisted: gaussian centers + covariances
    (sugar.render's `geom` hook) and the mesh/reg losses (shared_losses) are
    computed once outside the scan; XLA CSE did this implicitly for the
    unrolled form. Values and gradients are identical to compute_losses_multi
    (tests/test_multi_camera.py)."""
    geom = sugar.geom_primitives(params, model_config)

    def body(carry, cam_idx):
        camera = index_camera(data.cameras, cam_idx)
        img, pred_depth, aux = sugar.render_rgbd(
            params,
            model_config,
            camera,
            bg=cfg.bg_color,
            sh_deg=sh_deg,
            max_depth=cfg.max_depth,
            raster_config=raster_cfg,
            sh_band_w=sh_band_w,
            geom=geom,
            layout="cm",
        )
        loss_b, dict_b = pixel_losses(
            data, cam_idx, iteration, cfg, img, pred_depth, layout="cm"
        )
        return carry, (loss_b, dict_b, aux.num_pairs, aux.num_padded, aux.num_active)

    _, (losses_b, dicts_b, num_pairs, num_padded, num_active) = jax.lax.scan(
        body, None, cam_idxs
    )
    loss = losses_b.mean()
    loss_dict = {k: v.mean() for k, v in dicts_b.items()}
    loss_dict["num_pairs"] = num_pairs.max()
    loss_dict["num_padded"] = num_padded.max()
    loss_dict["num_active"] = num_active.max()

    s_loss, s_dict = shared_losses(
        params, model_config, data, iteration, cfg, unbind_weight, pre_sh_dc, gates
    )
    loss_dict.update(s_dict)
    return loss + s_loss, loss_dict


def make_train_step(
    model_config: sugar.SuGaRConfig,
    data: FrameData,
    cfg: RefineConfig,
    raster_cfg: RasterConfig,
    optimizer: optax.GradientTransformation,
    dynamic_sh: bool = True,
    opt_params=None,
    spatial_lr_scale: float | None = None,
):
    """Returns jitted step(params, opt_state, cam_idx, iteration, sh_deg, ...) ->
    (params, opt_state, loss, loss_dict). `cam_idx` may be a scalar (reference
    semantics) or an [B] int vector (multi-camera batch, see
    compute_losses_multi).

    With `dynamic_sh` (default) the SH warmup schedule of refine.py:837-839 is
    derived from the TRACED iteration inside the step (sh_deg is ignored): the
    whole frame shares ONE compiled program. Round 2 measured ~160 s of XLA
    compile per sh_deg re-jit over the axon tunnel — 3 of the 4 REFSCALE
    segments were compile, not compute (ROOFLINE.md). With dynamic_sh=False
    the step re-traces per static sh_deg (the round-2 behavior).

    With cfg.traced_hparams (compile-reuse mode) `optimizer` must be the
    direction-only transform (optimizer.make_adam_direction()) and
    opt_params/spatial_lr_scale must be given: the per-group learning rates
    (incl. the exp position schedule, sugar_optimizer.py:106-114) are computed
    on host per iteration and applied as TRACED scalars, and the per-frame cfg
    knobs ride in as TracedGates — so the lowered HLO contains no per-frame
    constants and one compiled program serves every frame/re-refine in the
    same shape bucket (the point of train/bucketing.py)."""

    dynamic_sh = dynamic_sh and cfg.do_sh_warmup  # without warmup sh_deg is already fixed
    traced = cfg.traced_hparams
    if traced:
        from gaustar_tpu.train.optimizer import make_lr_fn

        assert opt_params is not None and spatial_lr_scale is not None, (
            "traced_hparams needs opt_params + spatial_lr_scale for the host-side "
            "lr schedule"
        )
        lr_fn = make_lr_fn(opt_params, spatial_lr_scale)
        gates_const = TracedGates.from_config(cfg)

    # `data` and `model_config` ride as jit ARGUMENTS (via the wrapper below),
    # NOT closure constants: closure arrays are baked into the compile payload,
    # and 40 cameras of 1.6 MP GT (~1 GB) overflow the axon tunnel's remote
    # compiler request (HTTP 413) — observed in the round-3 refscale sequence.
    @functools.partial(jax.jit, static_argnames=("sh_deg",), donate_argnums=(0, 1))
    def _step(params, opt_state, mcfg, fdata, cam_idx, iteration, sh_deg, unbind_weight, pre_sh_dc, gates, lrs):
        if jnp.ndim(cam_idx) == 0:
            loss_impl = compute_losses
        elif cfg.batch_impl == "scan":
            loss_impl = compute_losses_multi_scan
        else:
            loss_impl = compute_losses_multi

        sh_band_w = None
        if dynamic_sh:
            # sh_deg_at, with a traced iteration: min(it//every + 1, L) - 1.
            if gates is not None:
                every = gates.sh_every
            else:
                every = max(cfg.num_iterations // 4, 1)
            cur_deg = jnp.minimum(iteration // every + 1, cfg.sh_levels) - 1
            # weight-vector length = the MODEL's band count (banded eval runs
            # over the full stored basis); cur_deg caps at cfg.sh_levels.
            sh_band_w = _sh.warmup_degree_weights(cur_deg, mcfg.sh_levels)

        def loss_fn(p):
            return loss_impl(
                p,
                mcfg,
                fdata,
                cam_idx,
                iteration,
                cfg,
                raster_cfg,
                sh_deg,
                unbind_weight,
                pre_sh_dc,
                sh_band_w,
                gates,
            )

        (loss, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if lrs is not None:
            # optax.adam == scale_by_adam then scale(-lr); applying the traced
            # per-group lrs here is exactly the reference's named-group Adam
            # (sugar_optimizer.py:67-87) with the constants as arguments.
            dirs, opt_state = optimizer.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(lambda d, lr: -lr * d, dirs, lrs)
        else:
            updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, loss_dict

    def step(params, opt_state, cam_idx, iteration, sh_deg, unbind_weight, pre_sh_dc):
        if dynamic_sh:
            sh_deg = 0  # ignored; must not vary the cache key
        gates = lrs = None
        if traced:
            gates = gates_const
            lrs = jax.tree_util.tree_map(jnp.float32, lr_fn(int(iteration)))
        return _step(
            params, opt_state, model_config, data,
            jnp.asarray(cam_idx, jnp.int32), jnp.int32(iteration), sh_deg,
            unbind_weight, pre_sh_dc, gates, lrs,
        )

    def prewarm(params_like, opt_state_like, batch: int | None = None):
        """AOT-compile this step's program for the given param/opt shapes
        WITHOUT executing it (jax shares the executable via the persistent
        compilation cache) — used to hide the loose-bind step compile under
        the training wall (train/sequence.py)."""
        p_sds = jax.eval_shape(lambda x: x, params_like)
        o_sds = jax.eval_shape(lambda x: x, opt_state_like)
        n = params_like.scales.shape[0]
        cam_sds = jax.ShapeDtypeStruct((batch,) if batch else (), jnp.int32)
        it_sds = jax.ShapeDtypeStruct((), jnp.int32)
        uw_sds = jax.ShapeDtypeStruct((n,), jnp.float32)
        pre_sds = jax.ShapeDtypeStruct((n, 3), jnp.float32)
        gates = lrs = None
        if traced:
            gates = gates_const
            lrs = jax.tree_util.tree_map(jnp.float32, lr_fn(1))
        _step.lower(
            p_sds, o_sds, model_config, data, cam_sds, it_sds, 0,
            uw_sds, pre_sds, gates, lrs,
        ).compile()

    step.prewarm = prewarm
    step.jitted = _step  # tests assert program identity on the lowered HLO
    return step


def sh_deg_at(iteration: int, cfg: RefineConfig) -> int:
    """SH warmup: start at degree 0, +1 level every num_iterations/4
    (refine.py:151-156, 837-839)."""
    if not cfg.do_sh_warmup:
        return cfg.sh_levels - 1
    every = max(cfg.num_iterations // 4, 1)
    return min(iteration // every + 1, cfg.sh_levels) - 1


def refine_frame(
    params: sugar.SuGaRParams,
    model_config: sugar.SuGaRConfig,
    data: FrameData,
    cfg: RefineConfig,
    raster_cfg: RasterConfig,
    opt_params: OptimizationParams | None = None,
    spatial_lr_scale: float | None = None,
    detect_topo_fn: Callable | None = None,
    pre_sh_dc=None,
    seed: int = 0,
    log_every: int = 50,
    log_fn: Callable | None = None,
    config_dump_path: str | None = None,
    checkpoint_every: int = 0,
    checkpoint_path: str | None = None,
    resume: bool = False,
    auto_size_caps: float | None = None,
):
    """Full refinement of one frame (refined_training, refine.py:39-866).

    `detect_topo_fn(params, config) -> per-gaussian unbind weight in [0, 1]` is
    invoked once at loose_bind_from (the detect_topo_err hook, refine.py:720-737);
    if >= 100 gaussian-groups are fully flagged the model is loose-bound and the
    delta regularizers activate. Returns (params, model_config, history).

    `auto_size_caps` (e.g. 1.2): probe the scene's true pair demand over all
    cameras once and jit the step with capacities = demand x this headroom —
    the CUDA path's exact per-call buffer sizing (rasterizer_impl.cu:277-303)
    recovered for static shapes; pair-scale ops cost proportionally to the
    static capacity (ROOFLINE.md). The overflow auto-retry below still guards
    scenes whose demand grows mid-frame (e.g. after unbinding).
    """
    # The jitted step donates its params/opt_state buffers; copy so the CALLER's
    # pytree stays valid after this function returns.
    params = jax.tree_util.tree_map(jnp.copy, params)

    n_faces = model_config.faces.shape[0]
    if model_config.face_mask is not None:
        # Bucketed model: the reference-formula inputs are the REAL counts.
        n_faces = int(np.asarray(model_config.face_mask).sum())
    if spatial_lr_scale is None:
        # refine.py:408: 10 * bbox_radius / sqrt(n_faces); bbox from mesh extent.
        pts = np.asarray(params.points)
        radius = float(np.linalg.norm(pts.max(0) - pts.min(0)) / 2.0)
        spatial_lr_scale = 10.0 * radius / np.sqrt(n_faces)
    if opt_params is None:
        opt_params = OptimizationParams(iterations=cfg.num_iterations)
    if cfg.traced_hparams:
        from gaustar_tpu.train.optimizer import make_adam_direction

        optimizer = make_adam_direction()
    else:
        optimizer = make_sugar_optimizer(opt_params, spatial_lr_scale)
    opt_state = optimizer.init(params)

    if auto_size_caps is not None:
        from gaustar_tpu.ops.rasterizer import probe_pair_demand, size_caps_to_demand

        d_pairs, d_padded, d_active = probe_pair_demand(
            sugar.gaussian_centers(params, model_config),
            sugar.cov3d(params, model_config),
            sugar.strengths(params),
            data.cameras,
            raster_cfg,
        )
        raster_cfg = size_caps_to_demand(
            raster_cfg, d_pairs, d_padded, auto_size_caps, demand_active=d_active,
            # Compile-reuse mode: quantize capacities so frame-to-frame demand
            # drift keeps the same static shapes (train/bucketing.py).
            quantize=(1 << 16) if cfg.traced_hparams else None,
        )
        if log_fn:
            log_fn({"auto_caps_pairs": raster_cfg.max_pairs, "auto_caps_padded": raster_cfg.max_padded})

    step = make_train_step(model_config, data, cfg, raster_cfg, optimizer,
                           opt_params=opt_params, spatial_lr_scale=spatial_lr_scale)

    if config_dump_path:
        # Reference: per-run config.json capturing all hyperparameters
        # (refine.py:459-519).
        import dataclasses as _dc
        import json as _json

        dump = {
            **_dc.asdict(cfg),
            "spatial_lr_scale": float(spatial_lr_scale),
            "n_faces": int(n_faces),
            "n_gaussians": int(params.scales.shape[0]),
            "opt": _dc.asdict(opt_params),
            "raster": {k: v for k, v in _dc.asdict(raster_cfg).items()},
        }
        with open(config_dump_path, "w") as f:
            _json.dump(dump, f, indent=2, sort_keys=True)

    n_cams = data.gt_images.shape[0]
    rng = np.random.default_rng(seed)
    order = rng.permutation(n_cams)
    cursor = 0

    n_g = params.scales.shape[0]
    unbind_weight = jnp.zeros((n_g,), jnp.float32)
    history = []
    loose = model_config.loose_bind

    # MID-FRAME resume (beyond the reference, which restarts the frame from the
    # mesh): restore params/opt/iteration, replay the loose-bind transition,
    # and fast-forward the camera-order rng so the schedule is bit-identical to
    # an uninterrupted run.
    start_it = 1
    if resume and checkpoint_path is not None and os.path.exists(checkpoint_path):
        from gaustar_tpu.io import checkpoint as ckpt_io

        params, opt_state, done_it, uw_saved, was_loose = ckpt_io.load_refine_state(
            checkpoint_path, opt_state
        )
        if was_loose and not loose:
            params, model_config = sugar.loose_bound(params, model_config)
            loose = True
            step = make_train_step(model_config, data, cfg, raster_cfg, optimizer,
                           opt_params=opt_params, spatial_lr_scale=spatial_lr_scale)
        if uw_saved is not None:
            unbind_weight = uw_saved
        start_it = done_it + 1
        for _ in range(done_it):
            if cursor >= n_cams:
                order = rng.permutation(n_cams)
                cursor = 0
            cursor += 1

    for it in range(start_it, cfg.num_iterations + 1):
        if cursor >= n_cams:
            order = rng.permutation(n_cams)
            cursor = 0
        cam_idx = int(order[cursor])
        cursor += 1

        # One-time unbind decision (refine.py:720-737).
        if it == cfg.loose_bind_from and detect_topo_fn is not None and not loose:
            face_weight = np.asarray(detect_topo_fn(params, model_config))  # [F] in [0,1]
            if model_config.face_mask is not None:
                # Bucketing padding faces all share vertex 0's detection weight;
                # they must never count toward the unbind decision.
                face_weight = face_weight * np.asarray(model_config.face_mask)
            w = 1.0 - np.repeat(face_weight, model_config.n_gaussians_per_face)
            n_changed = int((w == 0).sum())
            if n_changed >= cfg.unbind_threshold:
                params, model_config = sugar.loose_bound(params, model_config)
                unbind_weight = jnp.asarray(w, jnp.float32)
                loose = True
                # Rebuild step for the new (static) loose_bind config.
                step = make_train_step(model_config, data, cfg, raster_cfg, optimizer,
                           opt_params=opt_params, spatial_lr_scale=spatial_lr_scale)

        sh_deg = sh_deg_at(it, cfg)
        params, opt_state, loss, loss_dict = step(
            params,
            opt_state,
            jnp.int32(cam_idx),
            jnp.int32(it),
            sh_deg,
            unbind_weight,
            pre_sh_dc if pre_sh_dc is not None else params.sh_dc[:, 0, :] * 0.0,
        )
        if log_every and it % log_every == 0:
            entry = {k: float(v) for k, v in loss_dict.items()}
            entry["iteration"] = it
            entry["loss"] = float(loss)
            history.append(entry)
            if log_fn:
                log_fn(entry)

            # Capacity auto-retry (host-level): if the render truncated pairs,
            # double the raster capacities and re-jit the step. The CUDA path
            # sizes its buffers exactly per call (rasterizer_impl.cu:277-303);
            # our static shapes grow on demand instead.
            from gaustar_tpu.ops import binning as _binning

            H = int(data.gt_images.shape[1])
            W = int(data.gt_images.shape[2])
            from gaustar_tpu.ops.projection import TILE as _TILE

            n_tiles = ((W + _TILE - 1) // _TILE) * ((H + _TILE - 1) // _TILE)
            cap = _binning.default_capacity(
                raster_cfg.max_pairs, n_tiles, raster_cfg.chunk, raster_cfg.max_padded
            )
            active_over = (
                raster_cfg.max_active_tiles is not None
                and entry.get("num_active", 0) > raster_cfg.max_active_tiles
            )
            if (
                entry["num_pairs"] > raster_cfg.max_pairs
                or entry["num_padded"] > cap
                or active_over
            ):
                new_pairs = max(2 * raster_cfg.max_pairs, int(entry["num_pairs"]))
                new_padded = raster_cfg.max_padded
                if new_padded is not None:
                    new_padded = max(2 * new_padded, int(entry["num_padded"]))
                new_active = raster_cfg.max_active_tiles
                if new_active is not None:
                    new_active = max(2 * new_active, int(entry.get("num_active", 0)))
                raster_cfg = dataclasses.replace(
                    raster_cfg, max_pairs=new_pairs, max_padded=new_padded,
                    max_active_tiles=new_active,
                )
                step = make_train_step(model_config, data, cfg, raster_cfg, optimizer,
                           opt_params=opt_params, spatial_lr_scale=spatial_lr_scale)
                if log_fn:
                    log_fn({"iteration": it, "capacity_retry_max_pairs": new_pairs})

        if checkpoint_every and checkpoint_path and it % checkpoint_every == 0:
            from gaustar_tpu.io import checkpoint as ckpt_io

            ckpt_io.save_refine_state(
                checkpoint_path, params, opt_state, it, unbind_weight, loose
            )

    return params, model_config, history
