"""BASELINE.json configs 1-5 as explicit capability demos (compact versions)."""

import pytest
import os

import numpy as np
import jax
import jax.numpy as jnp

from gaustar_tpu.cameras import index_camera
from gaustar_tpu.models import gaussians, sugar
from gaustar_tpu.ops.losses import psnr
from gaustar_tpu.ops.rasterizer import RasterConfig
from gaustar_tpu.train import refine
from gaustar_tpu.train.refine import RefineConfig
from gaustar_tpu.utils.synthetic import synthetic_frame


pytestmark = pytest.mark.slow  # full-budget e2e tier (README: Tests)

def test_config1_static_unbound_rgb_only():
    """Config 1: static frame, unbound gaussians, few views, RGB-only loss."""
    _, config, data, target, rcfg = synthetic_frame(n_cams=4, w=48, h=48)
    rng = np.random.default_rng(0)
    pts = rng.normal(scale=0.4, size=(200, 3)).astype(np.float32) + np.array([0, 0, 4], np.float32)
    p = gaussians.create_from_pcd(pts, rng.uniform(size=(200, 3)).astype(np.float32))

    import optax

    opt = optax.adam(2e-2)
    st = opt.init(p)

    @jax.jit
    def step(p, st, ci):
        def loss(p):
            img, _ = gaussians.render(p, index_camera(data.cameras, ci), bg=(0, 1, 0), raster_config=rcfg)
            return jnp.abs(img - data.gt_images[ci]).mean()

        l, g = jax.value_and_grad(loss)(p)
        up, st = opt.update(g, st)
        return optax.apply_updates(p, up), st, l

    img0, _ = gaussians.render(p, index_camera(data.cameras, 0), bg=(0, 1, 0), raster_config=rcfg)
    p0 = float(psnr(img0, data.gt_images[0]))
    for it in range(40):
        p, st, l = step(p, st, jnp.int32(it % 4))
    imgN, _ = gaussians.render(p, index_camera(data.cameras, 0), bg=(0, 1, 0), raster_config=rcfg)
    assert float(psnr(imgN, data.gt_images[0])) > p0


def test_config2_mesh_bound_rgb_depth(tmp_path):
    """Config 2: single frame, mesh-bound gaussians, RGB + depth losses."""
    params, config, data, target, rcfg = synthetic_frame(n_cams=4, w=48, h=48)
    cfg = RefineConfig(num_iterations=20, loose_bind_from=10_000)
    dump = str(tmp_path / "config.json")
    out_params, _, hist = refine.refine_frame(
        params, config, data, cfg, rcfg, log_every=10, config_dump_path=dump
    )
    assert os.path.exists(dump)  # reference-style per-run config dump
    assert hist[-1]["depth_loss"] >= 0 and hist[-1]["rgb_loss"] >= 0
    assert hist[-1]["loss"] < hist[0]["loss"] * 2  # training is stable


def test_config3_full_refine_with_detection_stats():
    """Config 3: refine loop with SH warmup + densifier gradient statistics."""
    from gaustar_tpu.train import densifier

    params, config, data, target, rcfg = synthetic_frame(n_cams=4, w=48, h=48)
    n = params.scales.shape[0]
    dstate = densifier.init_state(n)

    # accumulate positional-gradient stats from a render (detection-only mode)
    def loss(dummy):
        img, aux = sugar.render(
            params, config, index_camera(data.cameras, 0), bg=(0, 1, 0),
            raster_config=rcfg, means2d_dummy=dummy,
        )
        return ((img - data.gt_images[0]) ** 2).sum()

    dummy = jnp.zeros((n, 2))
    g = jax.grad(loss)(dummy)
    img, aux = sugar.render(
        params, config, index_camera(data.cameras, 0), bg=(0, 1, 0), raster_config=rcfg
    )
    dstate = densifier.update_stats(dstate, g, aux.radii)
    mask, grads = densifier.densify_detection(dstate, max_grad=1e-7)
    assert mask.shape == (n,)
    assert bool(mask.any())  # some gaussians have positional gradient

    # SH warmup schedule active in refine
    assert refine.sh_deg_at(1, RefineConfig(num_iterations=2000)) == 0
    assert refine.sh_deg_at(1999, RefineConfig(num_iterations=2000)) == 2


def test_config4_sequence_covered():
    """Config 4 (dynamic sequence with flow warp + tracking) runs end-to-end in
    tests/test_sequence.py + FaceTracker tests; here: warp + tracker compose."""
    from gaustar_tpu.tools.warp_mesh import FaceTracker
    from gaustar_tpu.mesh.primitives import icosphere

    verts, faces = icosphere(1)
    tr = FaceTracker.sample(len(faces), start=0, step=10)
    pos = tr.positions(verts, faces)
    moved = verts + np.array([0.05, 0, 0], np.float32)
    pos2 = tr.positions(moved, faces)
    np.testing.assert_allclose(pos2 - pos, np.broadcast_to([0.05, 0, 0], pos.shape), atol=1e-6)


def test_config5_topology_plus_sharded():
    """Config 5: unbind + sharded training interplay (loose-bound model trains
    under the camera-sharded multi-device step)."""
    import dataclasses
    from gaustar_tpu.parallel.sharding import make_camera_mesh, make_sharded_train_step
    from gaustar_tpu.train.optimizer import OptimizationParams, make_sugar_optimizer

    n_dev = min(2, jax.device_count())
    params, config, data, target, rcfg = synthetic_frame(n_cams=n_dev)
    params, config = sugar.loose_bound(params, config)
    cfg = RefineConfig(num_iterations=4, loose_bind_from=10_000)
    optimizer = make_sugar_optimizer(OptimizationParams(), 1.0)
    opt_state = optimizer.init(params)
    mesh = make_camera_mesh(n_dev)
    step = make_sharded_train_step(config, data, cfg, rcfg, optimizer, mesh)(sh_deg=0)
    n_g = params.scales.shape[0]
    uw = jnp.ones((n_g,), jnp.float32)
    pre = params.sh_dc[:, 0, :] * 0.0
    cam_idx = jnp.zeros((n_dev, 1), jnp.int32)
    p1, _, loss, _caps = step(params, opt_state, cam_idx, jnp.int32(1), uw, pre)
    assert np.isfinite(float(loss))
    # the unbind deltas receive gradient under sharding
    assert float(jnp.abs(p1.delta_t - params.delta_t).max()) > 0
