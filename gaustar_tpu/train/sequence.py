"""Per-frame sequence driver — the train_seq.py equivalent (train_seq.py:101-249).

For each frame:
  1. bind a SuGaR model to the coarse mesh (frame 0: init_mesh with edge-iso 1000
     and area-iso 5000; later frames: the flow-warped warp_smooth mesh, area-iso
     1000, edge-iso off, SH-reg prior from the previous checkpoint);
  2. run the refinement loop (unbind detection at iters/2 unless disabled);
  3. if the model loose-bound: TSDF-fuse, update the mesh topology, write
     face_corr (track_face_mask + ref_area) and re-refine on the updated mesh
     for iters/2 with unbinding disabled;
  4. export checkpoint (.npz), color_mesh.obj, 3DGS .ply;
  5. flow-warp the color mesh to initialize the next frame.

File contracts mirror the reference (SURVEY section 1) so artifacts interoperate:
  work/<NNNN>/<iters>.npz (+.json), color_mesh.obj, <NNNN>.ply,
  work/<NNNN>/face_corr.npz, updated_mesh.obj,
  work/<NNNN+interval>/coarse_mesh/warp_smooth.obj
"""

from __future__ import annotations

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from gaustar_tpu.cameras import stack_cameras
from gaustar_tpu.io import checkpoint as ckpt_io
from gaustar_tpu.io import dataset as ds
from gaustar_tpu.io.meshio import read_obj, write_obj
from gaustar_tpu.mesh.topology import build_topology
from gaustar_tpu.models import sugar
from gaustar_tpu.ops.losses import edge_lengths, face_areas_normals
from gaustar_tpu.ops.rasterizer import RasterConfig
from gaustar_tpu.train import mesh_update, refine, topo_detect
from gaustar_tpu.tools import warp_mesh


@dataclasses.dataclass
class SequenceConfig:
    """train_seq.py:17-98 argument surface."""

    data_root: str = ""
    work_root: str = ""
    frame_0: int = 0
    frame_end: int = 1
    interval: int = 1
    refinement_iterations: int = 2000
    gaussians_per_triangle: int = 6
    disable_mesh_update: bool = False
    sh_reg: bool = True
    from_humanrf: bool = True
    downscale: float = 1.0
    init_mesh_name: str = "init_mesh_100k.obj"
    max_depth: float = 10.0
    # scale clamps relative to ref mesh mean edge (refine.py:307-311)
    max_gaussian_scalar: float = 5.0
    min_gaussian_scalar: float = 0.1
    # mesh-surgery overrides (reference defaults; toy scales need looser values)
    force_watertight: bool = True
    boundary_pad: float = 0.02
    update_cc_face_threshold: int = 80
    unbind_threshold: int = 100  # refine.py:720-737 flagged-gaussian count
    # TSDF fusion knobs (refined_mesh.py:312 defaults assume meter-scale rigs;
    # fusion_simplify_face_num > 0 decimates the fused mesh before grafting so a
    # fine voxel grid cannot explode the updated mesh's face count).
    fusion_voxel_size: float = 0.008
    fusion_sdf_trunc: float = 0.02
    fusion_depth_trunc: float = 6.0
    fusion_max_dim: int = 512
    fusion_simplify_face_num: int = 0
    fusion_use_orbit: bool = True  # 72 orbit cams + rig (refined_mesh.py:342-345)
    fusion_solid_opacity: float | None = None  # see extract_mesh_fusion
    # None = the reference's 10 * bbox_radius / sqrt(n_faces) (refine.py:408).
    # Scaled-down test scenes may boost it so unbound gaussians can migrate to
    # new surfaces within their (much smaller) iteration budget.
    spatial_lr_scale: float | None = None
    # Seed grafted (untracked) faces' colors by multi-view GT voting instead of
    # the TSDF fusion colors, which are integrated from half-trained renders and
    # converge slowly in the post-update re-refine (dark-patch artifact at short
    # budgets). Same voting as the dataset's initial coloring (ahq2gaustar
    # :124-160). Off = the reference's raw fusion-color behavior.
    recolor_new_faces: bool = True
    recolor_depth_agreement: float = 0.02
    # Demand-probed rasterizer capacities (ops/rasterizer.probe_pair_demand):
    # per frame, size the static pair buffers to measured demand x this factor
    # (the CUDA path's exact per-call sizing, rasterizer_impl.cu:277-303).
    # None = use raster_cfg's capacities as-is.
    auto_size_caps: float | None = None
    # Background AOT prewarm of the detection + fusion device programs while
    # the refine loop trains (topo_detect.prewarm_detect /
    # mesh_update.prewarm_fusion): their ~170 s first-frame tunnel compiles
    # hide under the training wall instead of serializing after it. The
    # reference pays no per-frame kernel compiles (CUDA is built at install
    # time); this is the TPU equivalent. No effect on results.
    prewarm_programs: bool = True
    # Face-count bucketing + traced hyperparameters (train/bucketing.py,
    # refine.TracedGates): pad faces (and vertices) to bucket multiples with
    # exactly-culled degenerate geometry and move the per-frame refine
    # constants into traced arguments, so ONE compiled step program serves
    # every frame AND the post-update re-refine (today each new face count
    # recompiles ~170 s over the axon tunnel; the reference pays zero).
    # Loss values/gradients are identical (masked means normalize by real
    # counts). None = off; 16384 is the production default at reference scale
    # (100k faces pad by <= 16%); tiny test scenes should pass a small bucket
    # or None.
    face_bucket: int | None = 16384


def _recolor_new_vertices(um, track_face_mask, cams, gt_images, gt_depths,
                          vc, depth_agreement=0.02, max_depth=10.0):
    """Replace colors of vertices introduced by the mesh update with multi-view
    GT color votes (projection + depth-visibility, like ahq2gaustar.py:124-160).
    Vertices also used by tracked faces, and unobserved vertices, keep `vc`."""
    faces = np.asarray(um.faces)
    # track_face_mask indexes the ORIGINAL mesh's faces; surviving tracked
    # faces occupy the PREFIX of the updated mesh (the tracking-prefix
    # invariant, refined_mesh.py:656-664), so the updated mesh's tracked set is
    # faces [0, sum(mask)).
    n_tracked = int(np.asarray(track_face_mask, bool).sum())
    tracked = np.zeros(len(faces), bool)
    tracked[:n_tracked] = True
    used_by_tracked = np.zeros(len(um.verts), bool)
    used_by_new = np.zeros(len(um.verts), bool)
    if tracked.any():
        used_by_tracked[np.unique(faces[tracked])] = True
    if (~tracked).any():
        used_by_new[np.unique(faces[~tracked])] = True
    new_verts = used_by_new & ~used_by_tracked
    if not new_verts.any():
        return vc

    verts = np.asarray(um.verts, np.float64)[new_verts]
    acc = np.zeros((len(verts), 3))
    cnt = np.zeros(len(verts))
    for ci, cam in enumerate(cams):
        view = np.asarray(cam.view)
        local = verts @ view[:3, :3].T + view[:3, 3]
        z = local[:, 2]
        fx = cam.width / (2.0 * float(np.asarray(cam.tanfovx)))
        fy = cam.height / (2.0 * float(np.asarray(cam.tanfovy)))
        px = local[:, 0] / np.maximum(z, 1e-6) * fx + float(np.asarray(cam.cx))
        py = local[:, 1] / np.maximum(z, 1e-6) * fy + float(np.asarray(cam.cy))
        ix = np.int32(px + 0.5)
        iy = np.int32(py + 0.5)
        ok = (z > 1e-3) & (ix >= 0) & (ix < cam.width) & (iy >= 0) & (iy < cam.height)
        ixc = np.clip(ix, 0, cam.width - 1)
        iyc = np.clip(iy, 0, cam.height - 1)
        d = np.asarray(gt_depths[ci])[iyc, ixc]
        vis = ok & (np.abs(z - d) < depth_agreement) & (d < max_depth)
        col = np.asarray(gt_images[ci])[iyc, ixc]
        acc[vis] += col[vis]
        cnt[vis] += 1
    seen = cnt >= 1
    out = np.array(vc, np.float64, copy=True)
    idx = np.flatnonzero(new_verts)[seen]
    out[idx] = acc[seen] / cnt[seen, None]
    return out


def _mesh_stats(verts, faces):
    topo = build_topology(faces, len(verts))
    el = np.asarray(edge_lengths(jnp.asarray(verts), jnp.asarray(topo.edges)))
    areas, _ = face_areas_normals(jnp.asarray(verts), jnp.asarray(faces))
    return topo, el, np.asarray(areas)


def _build_frame_data(cams, gt_images, gt_depths, topo, ref_edge_len, ref_area, faces=None):
    batch = stack_cameras(cams)
    margins = refine.compute_margins(
        np.asarray(batch.cx), np.asarray(batch.cy), batch.width, batch.height
    )
    data = refine.FrameData(
        cameras=batch,
        gt_images=jnp.asarray(gt_images),
        gt_depths=jnp.asarray(gt_depths),
        margins=jnp.asarray(margins),
        ref_edge_len=jnp.asarray(ref_edge_len),
        ref_area=jnp.asarray(ref_area),
        edges=jnp.asarray(topo.edges),
        adj_faces=jnp.asarray(topo.adj_faces),
    )
    if faces is not None:
        data = refine.with_face_edge_tables(data, faces)
    return data


_PREWARM_THREADS: list = []


def _start_prewarm(seq, params, config, data, raster_cfg, dcfg,
                   refine_cfg=None, step_raster=None):
    """Launch the background AOT compile of the detection + fusion programs
    (see SequenceConfig.prewarm_programs). Serial in one thread — concurrent
    XLA compiles contend at the host and finish LATER in aggregate (measured);
    overlap with device execution is what pays. Best-effort: any error is
    swallowed (the real call would then just compile inline as before)."""
    import threading

    def work():
        try:
            loose_cfg = dataclasses.replace(config, loose_bind=True)
            # The LOOSE-BIND train-step variant first: the one-time unbind
            # event (refine.py:720-737) flips the static loose_bind flag
            # MID-frame and rebuilds the step — without prewarm that compile
            # serializes inside the training loop. Traced-hparams mode only
            # (lr/gate values are traced there, so any spatial_lr_scale
            # lowers the identical program).
            if (
                refine_cfg is not None
                and refine_cfg.traced_hparams
                and not config.loose_bind
            ):
                import jax

                from gaustar_tpu.train.optimizer import (
                    OptimizationParams, make_adam_direction,
                )

                opt = make_adam_direction()
                ostate = jax.eval_shape(opt.init, params)
                st = refine.make_train_step(
                    loose_cfg, data, refine_cfg, step_raster or raster_cfg, opt,
                    opt_params=OptimizationParams(iterations=refine_cfg.num_iterations),
                    spatial_lr_scale=1.0,
                )
                st.prewarm(params, ostate)

            gt_shape = tuple(np.asarray(data.gt_depths).shape)
            # Mid-refine detection runs before unbind → loose_bind=False.
            topo_detect.prewarm_detect(
                params, config, data.cameras, gt_shape, raster_cfg, dcfg,
            )
            # Fusion and the post-refine detect only run AFTER the model
            # loose-bound (run_sequence's `if config.loose_bind:` branch), and
            # loose_bind is a STATIC jit field (sugar.SuGaRConfig) — a
            # different executable cache key. Prewarm the loose variants or
            # their ~170 s compiles serialize inline after join_prewarm()
            # (ADVICE r4). SuGaRParams always carries delta_t/delta_r, so
            # shapes match and mid-training params are fine.
            mesh_update.prewarm_fusion(
                params, loose_cfg, data.cameras, raster_cfg,
                voxel_size=seq.fusion_voxel_size,
                sdf_trunc=seq.fusion_sdf_trunc,
                depth_trunc=seq.fusion_depth_trunc,
                use_orbit_cameras=seq.fusion_use_orbit,
                max_dim=seq.fusion_max_dim,
                solid_opacity=seq.fusion_solid_opacity,
            )
            topo_detect.prewarm_detect(
                params, loose_cfg, data.cameras, gt_shape, raster_cfg, dcfg,
            )
        except Exception:  # noqa: BLE001
            pass

    t = threading.Thread(target=work, daemon=True, name="gaustar-prewarm")
    t.start()
    _PREWARM_THREADS.append(t)


def join_prewarm(timeout: float | None = None) -> None:
    """Wait for outstanding prewarm threads (run_sequence calls this before
    the fusion/detection stage; tests may call it for determinism)."""
    while _PREWARM_THREADS:
        _PREWARM_THREADS.pop().join(timeout)


def refine_one_frame(
    seq: SequenceConfig,
    frame: int,
    mesh_verts: np.ndarray,
    mesh_faces: np.ndarray,
    mesh_colors: np.ndarray | None,
    cams,
    gt_images,
    gt_depths,
    raster_cfg: RasterConfig,
    is_first_frame: bool,
    pre_sh: np.ndarray | None = None,
    ref_area_override: np.ndarray | None = None,
    num_iterations: int | None = None,
    enable_unbind: bool = True,
    detect_cfg: topo_detect.TopoDetectConfig | None = None,
    config_dump_path: str | None = None,
    metrics_path: str | None = None,
    init_sh: tuple | None = None,
):
    """One refined_training invocation. Returns (params, config, data, topo).

    `init_sh = (sh_dc [N,1,3], sh_rest [N,K-1,3])` initializes the SH
    coefficients from the previous frame's CHECKPOINT (the reference loads the
    previous `.pt` as color prior, refine.py:325-383) instead of the lossy
    color_mesh.obj vertex-color round-trip — sh_rest survives across frames.
    Ignored (with a fallback to vertex colors) if the gaussian count changed."""
    topo, ref_edge_len, ref_area = _mesh_stats(mesh_verts, mesh_faces)
    if ref_area_override is not None:
        ref_area = ref_area_override

    mean_edge = float(ref_edge_len.mean())
    params, config = sugar.init_sugar(
        mesh_verts,
        mesh_faces,
        vertex_colors=mesh_colors,
        n_gaussians_per_face=seq.gaussians_per_triangle,
        min_scale=mean_edge * seq.min_gaussian_scalar,
        max_scale=mean_edge * seq.max_gaussian_scalar,
    )
    if init_sh is not None:
        dc, rest = init_sh
        if (
            dc is not None
            and dc.shape == tuple(params.sh_dc.shape)
            and rest.shape == tuple(params.sh_rest.shape)
        ):
            params = dataclasses.replace(
                params, sh_dc=jnp.asarray(dc), sh_rest=jnp.asarray(rest)
            )

    data = _build_frame_data(
        cams, gt_images, gt_depths, topo, ref_edge_len, ref_area, faces=mesh_faces
    )

    if seq.face_bucket:
        # Compile-reuse mode (SequenceConfig.face_bucket): pad model + frame
        # tables to the bucket; the refine step runs with traced hyperparams.
        from gaustar_tpu.train import bucketing

        params, config = bucketing.pad_sugar(
            params, config, seq.face_bucket, vert_bucket=max(seq.face_bucket // 2, 16)
        )
        data = bucketing.pad_frame_tables(
            data, np.asarray(mesh_faces), int(config.faces.shape[0]),
            edge_bucket=seq.face_bucket * 2,
        )
        if pre_sh is not None:
            n_pad = int(params.scales.shape[0]) - len(np.asarray(pre_sh))
            if n_pad > 0:
                pre_sh = np.concatenate(
                    [np.asarray(pre_sh), np.zeros((n_pad, 3), np.float32)], axis=0
                )

    iters = num_iterations or seq.refinement_iterations
    cfg = refine.RefineConfig(
        num_iterations=iters,
        edge_iso_factor=1000.0,
        edge_iso_from=0 if is_first_frame else 999_999,
        area_iso_factor=5000.0 if is_first_frame else 1000.0,
        use_sh_reg=seq.sh_reg and pre_sh is not None,
        loose_bind_from=(iters // 2) if (enable_unbind and not seq.disable_mesh_update) else 999_999,
        unbind_threshold=seq.unbind_threshold,
        max_depth=seq.max_depth,
        traced_hparams=bool(seq.face_bucket),
    )

    # With auto_size_caps the step capacities are probed HERE (not inside
    # refine_frame) so the background loose-step prewarm compiles the same
    # program the training loop will run. Quantized in bucketed mode so
    # frame-to-frame demand drift keeps the shapes (ops/rasterizer.py).
    step_raster = raster_cfg
    if seq.auto_size_caps is not None:
        from gaustar_tpu.ops.rasterizer import probe_pair_demand, size_caps_to_demand

        d_pairs, d_padded, d_active = probe_pair_demand(
            sugar.gaussian_centers(params, config),
            sugar.cov3d(params, config),
            sugar.strengths(params),
            data.cameras,
            raster_cfg,
        )
        step_raster = size_caps_to_demand(
            raster_cfg, d_pairs, d_padded, seq.auto_size_caps,
            demand_active=d_active,
            quantize=(1 << 16) if seq.face_bucket else None,
        )

    detect_fn = None
    _log_holder: list = [None]  # filled with the MetricLogger's log_fn below
    if enable_unbind and not seq.disable_mesh_update:
        dcfg = detect_cfg or topo_detect.TopoDetectConfig(max_depth=seq.max_depth)

        def detect_fn(p, c):
            fw = topo_detect.detect_topo_err(
                p, c, data.cameras, np.asarray(data.gt_depths), topo, raster_cfg, dcfg
            )
            # Coverage observability into the frame's metric stream (VERDICT
            # r4: all-zero detection must leave a signal).
            if _log_holder[0] is not None and topo_detect.last_telemetry is not None:
                _log_holder[0]({"step": -1, **topo_detect.last_telemetry.as_dict()})
            return fw

        if seq.prewarm_programs:
            _start_prewarm(seq, params, config, data, raster_cfg, dcfg,
                           refine_cfg=cfg, step_raster=step_raster)

    # Scalar event stream per frame (TB-equivalent, utils/logging.py): the
    # reference writes TensorBoard scalars (gaussian_splatting/train.py:170-209);
    # here a mergeable JSONL file next to the frame's outputs.
    logger = None
    log_fn = None
    if metrics_path is not None:
        from gaustar_tpu.utils.logging import MetricLogger

        logger = MetricLogger(metrics_path, run_meta={"frame": frame, "iters": iters})
        log_fn = logger.as_log_fn()
        _log_holder[0] = log_fn
    try:
        params, config, history = refine.refine_frame(
            params,
            config,
            data,
            cfg,
            step_raster,
            spatial_lr_scale=seq.spatial_lr_scale,
            detect_topo_fn=detect_fn,
            pre_sh_dc=None if pre_sh is None else jnp.asarray(pre_sh),
            config_dump_path=config_dump_path,
            log_fn=log_fn,
            auto_size_caps=None,  # probed above (step_raster)
        )
    finally:
        if logger is not None:
            logger.close()
    return params, config, data, topo, history


def run_sequence(
    seq: SequenceConfig,
    raster_cfg: RasterConfig | None = None,
    detect_cfg: topo_detect.TopoDetectConfig | None = None,
    warp_cfg: warp_mesh.WarpConfig | None = None,
):
    """The full per-frame loop (train_seq.py:101-249)."""
    raster_cfg = raster_cfg or RasterConfig()
    cmr = ds.load_rgb_cameras(os.path.join(seq.data_root, "rgb_cameras.npz"))
    cams = ds.cameras_from_npz(cmr, seq.downscale)
    n_cams = len(cams)

    pre_sh = None
    prev_sh_full = None  # (sh_dc, sh_rest) checkpoint color prior (refine.py:325-383)
    prev_color_mesh = None

    for f_idx in range(seq.frame_0, seq.frame_end, seq.interval):
        fdir = os.path.join(seq.work_root, f"{f_idx:04d}")
        os.makedirs(fdir, exist_ok=True)
        is_first = f_idx == seq.frame_0

        if is_first:
            mesh_path = os.path.join(seq.data_root, seq.init_mesh_name)
        else:
            mesh_path = os.path.join(fdir, "coarse_mesh", "warp_smooth.obj")
        verts, faces, colors = read_obj(mesh_path)

        gt_images, gt_depths = ds.load_frame_images(
            seq.data_root, f_idx, n_cams, seq.from_humanrf, seq.max_depth
        )

        n_real_verts, n_real_faces = len(verts), len(faces)
        params, config, data, topo, _ = refine_one_frame(
            seq, f_idx, verts, faces, colors, cams, gt_images, gt_depths,
            raster_cfg, is_first, pre_sh=pre_sh, detect_cfg=detect_cfg,
            config_dump_path=os.path.join(fdir, "config.json"),
            metrics_path=os.path.join(fdir, "metrics.jsonl"),
            init_sh=prev_sh_full,
        )

        def _unpadded(p, c, nv):
            """Strip bucketing padding for host-side surgery/exports."""
            if c.face_mask is None:
                return p, c
            from gaustar_tpu.train import bucketing

            return bucketing.unpad_sugar(p, c, n_verts=nv)

        # --- mesh update if unbound (train_seq.py:150-213) ---
        if config.loose_bind and not seq.disable_mesh_update:
            join_prewarm()
            # Fusion + detection run on the (possibly padded) model — padding
            # gaussians are opacity-culled exactly, and these shapes match the
            # background prewarm's.
            fusion = mesh_update.extract_mesh_fusion(
                params, config, data.cameras, raster_cfg,
                voxel_size=seq.fusion_voxel_size,
                sdf_trunc=seq.fusion_sdf_trunc,
                depth_trunc=seq.fusion_depth_trunc,
                max_dim=seq.fusion_max_dim,
                simplify_face_num=seq.fusion_simplify_face_num,
                use_orbit_cameras=seq.fusion_use_orbit,
                solid_opacity=seq.fusion_solid_opacity,
            )
            dcfg = detect_cfg or topo_detect.TopoDetectConfig(max_depth=seq.max_depth)
            face_w = topo_detect.detect_topo_err(
                params, config, data.cameras, np.asarray(data.gt_depths), topo,
                raster_cfg, dcfg,
            )[:n_real_faces]
            u_params, u_config = _unpadded(params, config, n_real_verts)
            out = mesh_update.update_mesh_with_fusion(
                u_params, u_config, fusion, face_w,
                force_watertight=seq.force_watertight,
                boundary_pad=seq.boundary_pad,
                cc_face_threshold=seq.update_cc_face_threshold,
            )
            if out.get("cc_update_num", 0) > 0:
                um = out["updated_mesh"]
                write_obj(os.path.join(fdir, "updated_mesh.obj"), um.verts, um.faces)
                np.savez_compressed(
                    os.path.join(fdir, "face_corr.npz"),
                    track_face_mask=out["track_face_mask"],
                    ref_area=out["new_ref_area"],
                )
                # Re-refine on the updated mesh, half iterations, no unbind.
                vc = _face_colors_to_vertex(um)
                if seq.recolor_new_faces:
                    vc = _recolor_new_vertices(
                        um, out["track_face_mask"], cams, gt_images, gt_depths,
                        vc, seq.recolor_depth_agreement, seq.max_depth,
                    )
                params, config, data, topo, _ = refine_one_frame(
                    seq, f_idx, um.verts.astype(np.float32), um.faces.astype(np.int32),
                    vc, cams, gt_images, gt_depths, raster_cfg,
                    is_first_frame=False,
                    pre_sh=None,
                    ref_area_override=out["new_ref_area"],
                    num_iterations=seq.refinement_iterations // 2,
                    enable_unbind=False,
                )
                n_real_verts, n_real_faces = len(um.verts), len(um.faces)

        # --- exports (refine.py:845-864, refined_mesh.py:1223-1228) ---
        # Always from the UNPADDED model: checkpoints/plys/meshes carry only
        # real geometry regardless of the bucketing mode.
        e_params, e_config = _unpadded(params, config, n_real_verts)
        ckpt_io.save_sugar(
            os.path.join(fdir, f"{seq.refinement_iterations}.npz"), e_params, e_config
        )
        ckpt_io.export_refined_ply(os.path.join(fdir, f"{f_idx:04d}.ply"), e_params, e_config)
        color_mesh = mesh_update.get_color_mesh(e_params, e_config)
        vc = _face_colors_to_vertex(color_mesh)
        write_obj(
            os.path.join(fdir, "color_mesh.obj"), color_mesh.verts, color_mesh.faces, vc
        )

        pre_sh = np.asarray(e_params.sh_dc)[:, 0, :]
        # Full-SH checkpoint prior for the next frame. If the mesh was updated
        # this frame, params already live on the updated topology — the same
        # mesh the warp carries forward — so the mapping through face_corr is
        # implicit (the re-refine re-bound to the updated faces).
        prev_sh_full = (np.asarray(e_params.sh_dc), np.asarray(e_params.sh_rest))
        prev_color_mesh = color_mesh

        # --- warp to next frame (train_seq.py:242-245) ---
        next_f = f_idx + seq.interval
        if next_f < seq.frame_end:
            _, gt_depths_next = ds.load_frame_images(
                seq.data_root, next_f, n_cams, seq.from_humanrf, seq.max_depth
            )
            flows_f, flows_b = ds.load_frame_flows(
                seq.data_root, f_idx, n_cams, seq.interval, shape=tuple(cmr["shape"][0]),
            )
            warped, _, _ = warp_mesh.warp_mesh_using_flow(
                color_mesh.verts, color_mesh.faces, cmr,
                flows_f, flows_b, list(gt_depths), list(gt_depths_next),
                warp_cfg or warp_mesh.WarpConfig(),
            )
            out_dir = os.path.join(seq.work_root, f"{next_f:04d}", "coarse_mesh")
            os.makedirs(out_dir, exist_ok=True)
            write_obj(os.path.join(out_dir, "warp_smooth.obj"), warped, color_mesh.faces, vc)

        # Drain this frame's prewarm thread before the next frame starts its
        # own: on no-topology-change frames nothing else joins it, and two
        # concurrent XLA compiles contend at the host (the exact situation
        # _start_prewarm documents avoiding; ADVICE r4).
        join_prewarm()


def _face_colors_to_vertex(mesh) -> np.ndarray:
    """Average face colors onto vertices (for OBJ vertex-color export)."""
    vc = np.zeros((len(mesh.verts), 3))
    cnt = np.zeros(len(mesh.verts))
    fc = mesh.face_colors if mesh.face_colors is not None else np.full((len(mesh.faces), 3), 0.5)
    for k in range(3):
        np.add.at(vc, mesh.faces[:, k], fc[:, :3])
        np.add.at(cnt, mesh.faces[:, k], 1)
    return vc / np.maximum(cnt, 1)[:, None]
