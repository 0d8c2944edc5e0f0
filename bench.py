"""Benchmark: the REAL refine training step at reference scale.

What is timed (one step = one iteration of gaustar_trainers/refine.py:529-841):
  - SuGaR mesh-bound model: 100,000-face mesh x 6 gaussians/face = 600,000
    gaussians (README.md:270, train_seq.py:43-44)
  - RGB rasterizer pass at 1.6 MP + margin-masked 0.8*L1 + 0.2*DSSIM (SSIM
    window convs included)
  - SECOND rasterizer pass for depth (view-space z as color) + depth/mask losses
  - mesh losses: normal consistency, edge-iso, area-iso over the 100k-face mesh
  - full backward through all of it + named-group Adam update
  - cameras CYCLE per step (not one pinned camera)

Metric: Mpix/s of fwd+bwd per chip = H*W / step_time. NOTE one step rasterizes
the frame TWICE; the per-pass rasterizer throughput is ~2x the reported number.
vs_baseline compares against a 7.5 Mpix/s estimate for the reference CUDA
pipeline (2000-iteration refine of a ~1.5 MP frame in a few minutes on one GPU;
the repo publishes no numbers — BASELINE.md). See ROOFLINE.md for the HBM/flops
budget behind the number.

Env knobs: GAUSTAR_BENCH_DETAIL=1 additionally times preprocess/binning/blend
stages separately and writes BENCH_DETAIL.json (stdout stays one JSON line).

NOTE (axon tunnel): jax.block_until_ready does not synchronize; timing forces a
host fetch of a scalar and amortizes the RPC floor over K on-device iterations.
"""

import json
import os
import sys
import time

import numpy as np


def _enable_jit_cache():
    """Persistent XLA compilation cache (keyed by HLO+flags+versions): the
    full-step compile is ~6 min on the tunnel; reruns hit the disk cache."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("GAUSTAR_JIT_CACHE", "/tmp/gaustar_jit_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


_enable_jit_cache()

REFERENCE_MPIX_S = 7.5
W, H = 1600, 1024  # 1.6 MP (ActorsHQ 4x rig is ~1.5 MP/view, cameras.py:20)
N_LAT, N_LON = 201, 250  # 2*250*200 = 100,000 faces -> 600,000 gaussians
K = 8  # timed steps per measurement


def build_scene():
    import jax.numpy as jnp

    from gaustar_tpu.cameras import stack_cameras
    from gaustar_tpu.mesh.primitives import uv_sphere
    from gaustar_tpu.mesh.topology import build_topology
    from gaustar_tpu.models import sugar
    from gaustar_tpu.ops.losses import edge_lengths, face_areas_normals
    from gaustar_tpu.ops.rasterizer import RasterConfig
    from gaustar_tpu.train.refine import FrameData, compute_margins
    from gaustar_tpu.utils.synthetic import ring_cameras

    verts, faces = uv_sphere(N_LAT, N_LON, radius=0.6, center=(0.0, 0.0, 4.0))
    rng = np.random.default_rng(0)
    colors = rng.uniform(0.2, 0.9, size=(len(verts), 3)).astype(np.float32)
    params, config = sugar.init_sugar(verts, faces, vertex_colors=colors)

    cams = ring_cameras(4, w=W, h=H, focal=1600.0)
    batch = stack_cameras(cams)

    # Synthetic GT (content does not affect step cost): gray foreground inside
    # the projected sphere disc, green-screen background; depth 4 m fg / 10.5 bg.
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    r_px = 1600.0 * 0.6 / 3.4  # projected sphere radius upper bound
    disc = ((xx - W / 2) ** 2 + (yy - H / 2) ** 2) < r_px**2
    gt = np.where(disc[..., None], 0.5, np.array([0.0, 1.0, 0.0], np.float32))
    gt_img = np.broadcast_to(gt, (4, H, W, 3)).astype(np.float32)
    gt_depth = np.where(disc, 4.0, 10.5).astype(np.float32)
    gt_depth = np.broadcast_to(gt_depth, (4, H, W))

    topo = build_topology(np.asarray(faces), len(verts))
    ref_edge_len = np.asarray(edge_lengths(jnp.asarray(verts), jnp.asarray(topo.edges)))
    ref_area, _ = face_areas_normals(jnp.asarray(verts), jnp.asarray(faces))
    margins = compute_margins(np.asarray(batch.cx), np.asarray(batch.cy), W, H)

    data = FrameData(
        cameras=batch,
        gt_images=jnp.asarray(gt_img),
        gt_depths=jnp.asarray(gt_depth),
        margins=jnp.asarray(margins),
        ref_edge_len=jnp.asarray(ref_edge_len),
        ref_area=jnp.asarray(ref_area),
        edges=jnp.asarray(topo.edges),
        adj_faces=jnp.asarray(topo.adj_faces),
    )
    from gaustar_tpu.train.refine import with_face_edge_tables

    data = with_face_edge_tables(data, faces)
    # Capacities sized to the measured demand (examples/profile_binning.py:
    # num_pairs 1.07M, num_padded 1.17M at this scale) with ~2x headroom —
    # every pair-scale op costs proportionally to the STATIC capacity, and the
    # host-level auto-retry (train/refine.py) re-jits with doubled capacity if
    # a scene overflows.
    chunk = int(os.environ.get("GAUSTAR_BENCH_CHUNK", "256"))
    # Finer chunks waste fewer padded slots (9% at 256 -> ~4.5% at 128) but
    # add scan steps per pair; measured empirically via GAUSTAR_BENCH_CHUNK.
    raster_cfg = RasterConfig(
        max_pairs=1_536_000, max_padded=1_600_000, chunk=chunk, impl="pallas"
    )
    return params, config, data, raster_cfg


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from gaustar_tpu.train.optimizer import OptimizationParams, make_sugar_optimizer
    from gaustar_tpu.train.refine import RefineConfig, compute_losses

    t_setup = time.time()
    params, config, data, raster_cfg = build_scene()

    # Demand-probed capacities (GAUSTAR_BENCH_AUTOCAPS=0 reverts to the fixed
    # 1.536M/1.6M): one jitted scan measures the scene's true pair demand, and
    # the step jits with demand x 1.15 — the TPU equivalent of the CUDA path's
    # exact per-call buffer sizing (rasterizer_impl.cu:277-303). Pair-scale ops
    # cost proportionally to STATIC capacity, so right-sizing is pure win; the
    # host auto-retry still guards growth (train/refine.py).
    if os.environ.get("GAUSTAR_BENCH_AUTOCAPS", "1") != "0":
        from gaustar_tpu.models import sugar as _sugar
        from gaustar_tpu.ops.rasterizer import probe_pair_demand, size_caps_to_demand

        d_pairs, d_padded, d_active = probe_pair_demand(
            _sugar.gaussian_centers(params, config),
            _sugar.cov3d(params, config),
            _sugar.strengths(params),
            data.cameras,
            raster_cfg,
        )
        raster_cfg = size_caps_to_demand(
            raster_cfg, d_pairs, d_padded, demand_active=d_active
        )
        print(
            f"# autocaps: demand pairs={d_pairs} padded={d_padded} active={d_active}"
            f" -> max_pairs={raster_cfg.max_pairs} max_padded={raster_cfg.max_padded}"
            f" max_active={raster_cfg.max_active_tiles}",
            file=sys.stderr,
        )
    cfg = RefineConfig(num_iterations=2000, loose_bind_from=10**9, do_sh_warmup=False)
    optimizer = make_sugar_optimizer(OptimizationParams(), 1.0)
    opt_state = optimizer.init(params)
    n_g = params.scales.shape[0]
    uw = jnp.zeros((n_g,), jnp.float32)
    pre = params.sh_dc[:, 0, :] * 0.0
    setup_s = time.time() - t_setup

    # GAUSTAR_BENCH_BATCH: camera batch per step (compute_losses_multi).
    # DEFAULT 4 (r5): the reference's one-camera iteration is a choice, not a
    # constraint (SURVEY §2.1); batching amortizes the camera-independent work
    # (SuGaR primitives, mesh losses, Adam) and is the production layout the
    # camera-DP path shards. B=1 reproduces the reference regime exactly
    # (measured r5: 98.9 ms = 16.56 Mpix/s; B=4: 86.2 ms/cam = 19.01 Mpix/s).
    batch = int(os.environ.get("GAUSTAR_BENCH_BATCH", "4"))

    def one_step(params, opt_state, it):
        if batch == 1:
            cam_idx = jnp.mod(it, 4)
        else:
            cam_idx = jnp.mod(it * batch + jnp.arange(batch), 4).astype(jnp.int32)

        def loss_fn(p):
            from gaustar_tpu.train.refine import (
                compute_losses_multi,
                compute_losses_multi_scan,
            )

            # GAUSTAR_BENCH_BATCH_IMPL: "unroll" (trace-time unroll over B;
            # compile grows with B, XLA CSEs camera-independent work) or
            # "scan" (lax.scan over cameras; flat compile, hoisted geometry).
            if batch == 1:
                impl = compute_losses
            elif os.environ.get("GAUSTAR_BENCH_BATCH_IMPL", "unroll") == "scan":
                impl = compute_losses_multi_scan
            else:
                impl = compute_losses_multi
            return impl(
                p, config, data, cam_idx, it, cfg, raster_cfg, 2, uw, pre
            )

        (loss, _ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def run(params, opt_state):
        def body(i, carry):
            p, o, acc = carry
            p, o, loss = one_step(p, o, i)
            return (p, o, acc + loss)

        p, o, acc = lax.fori_loop(0, K, body, (params, opt_state, jnp.float32(0.0)))
        return acc

    t0 = time.time()
    _ = float(run(params, opt_state))  # compile + first K steps; fetch = sync
    compile_s = time.time() - t0

    t0 = time.time()
    _ = float(run(params, opt_state))
    dt = (time.time() - t0) / K
    mpix_s = W * H * batch / dt / 1e6

    metric = (
        "Mpix/s full refine step per chip "
        "(600k gaussians, 1.6MP, RGB+depth passes, SSIM+mesh losses, Adam)"
    )
    if batch != 1:
        b_impl = os.environ.get("GAUSTAR_BENCH_BATCH_IMPL", "unroll")
        metric += f" [camera batch B={batch}, {b_impl}]"
    result = {
        "metric": metric,
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / REFERENCE_MPIX_S, 3),
        "batch": batch,
        "ms_per_camera": round(dt * 1e3 / batch, 2),
    }
    print(json.dumps(result))
    print(
        f"# step {dt*1e3:.1f} ms, compile {compile_s:.0f}s, setup {setup_s:.0f}s, "
        f"backend={jax.default_backend()}, n_gauss={n_g}",
        file=sys.stderr,
    )

    if os.environ.get("GAUSTAR_BENCH_DETAIL"):
        detail = bench_detail(params, config, data, raster_cfg, dt)
        with open("BENCH_DETAIL.json", "w") as f:
            json.dump(detail, f, indent=2)
        print(f"# detail: {json.dumps(detail)}", file=sys.stderr)


def bench_detail(params, config, data, raster_cfg, full_step_s):
    """Per-stage timing: preprocess+binning / blend fwd / whole render fwd /
    render fwd+bwd — isolates where the step time goes (ROOFLINE.md)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from gaustar_tpu.cameras import index_camera
    from gaustar_tpu.models import sugar
    from gaustar_tpu.ops import binning
    from gaustar_tpu.ops.projection import TILE, preprocess
    from gaustar_tpu.ops.sh import eval_sh
    from gaustar_tpu.utils.profiling import loop_bench

    camera = index_camera(data.cameras, 0)
    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE

    centers = sugar.gaussian_centers(params, config)
    cov3d = sugar.cov3d(params, config)
    opac = sugar.strengths(params)
    col = jnp.ones((centers.shape[0], 3), jnp.float32) * 0.5

    def prep_bin(i, m, c, o, f):
        g = preprocess(m + i * 0.0, c, o, f, camera)
        b = binning.bin_gaussians(g, grid_x, grid_y, raster_cfg.max_pairs, raster_cfg.chunk, raster_cfg.max_padded)
        pd = binning.gather_pair_data(g, b)
        return pd.sum() + b.num_pairs.astype(jnp.float32)

    def fwd(i, m):
        import dataclasses

        p = dataclasses.replace(params, points=params.points + i * 0.0)
        img, _ = sugar.render(
            p, config, camera, bg=(0.0, 1.0, 0.0), sh_deg=2, raster_config=raster_cfg
        )
        return img.sum()

    def fwdbwd(i, _m):
        def loss(p):
            img, _ = sugar.render(p, config, camera, bg=(0.0, 1.0, 0.0), sh_deg=2, raster_config=raster_cfg)
            return ((img - 0.5) ** 2).mean() + i * 1e-12

        l, g = jax.value_and_grad(loss)(params)
        return l + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

    t_pb = loop_bench(prep_bin, centers, cov3d, opac, col, iters=8)
    t_fwd = loop_bench(fwd, centers, iters=8)
    t_fb = loop_bench(fwdbwd, centers, iters=8)
    return {
        "full_step_s": round(full_step_s, 5),
        "preprocess_binning_s": round(t_pb, 5),
        "render_fwd_s": round(t_fwd, 5),
        "render_fwdbwd_s": round(t_fb, 5),
        "blend_fwd_est_s": round(t_fwd - t_pb, 5),
        "note": "full step = 2 renders fwd+bwd + SSIM + mesh losses + Adam",
    }


if __name__ == "__main__":
    main()
