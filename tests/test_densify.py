"""Densifier + vanilla 3DGS training loop."""

import numpy as np
import jax.numpy as jnp

from gaustar_tpu.models import gaussians, sugar
from gaustar_tpu.ops.rasterizer import RasterConfig
from gaustar_tpu.train import densifier
from gaustar_tpu.train.train_gaussians import GSTrainConfig, train_gaussians
from gaustar_tpu.utils.synthetic import synthetic_frame
from gaustar_tpu.ops.losses import psnr
from gaustar_tpu.cameras import index_camera


def test_stats_and_detection():
    st = densifier.init_state(5)
    g = jnp.asarray([[0.1, 0.0]] * 5)
    radii = jnp.asarray([1, 0, 2, 3, 0])
    st = densifier.update_stats(st, g, radii)
    st = densifier.update_stats(st, g * 3, radii)
    mask, grads = densifier.densify_detection(st, max_grad=0.15)
    # visible gaussians averaged (0.1+0.3)/2 = 0.2 >= 0.15; invisible -> 0
    np.testing.assert_array_equal(np.asarray(mask), [True, False, True, True, False])


def test_densify_and_prune_shapes():
    rng = np.random.default_rng(0)
    n = 100
    p = gaussians.create_from_pcd(
        rng.normal(size=(n, 3)).astype(np.float32), rng.uniform(size=(n, 3)).astype(np.float32)
    )
    st = densifier.init_state(n)
    # large gradient on first 10 (5 small scale -> clone, 5 large -> split)
    g = np.zeros((n, 2), np.float32)
    g[:10] = 1.0
    sc = np.asarray(p.scaling).copy()
    sc[:5] = -8.0  # small -> clone
    sc[5:10] = 2.0  # large -> split
    import dataclasses
    p = dataclasses.replace(p, scaling=jnp.asarray(sc))
    st = densifier.update_stats(st, jnp.asarray(g), jnp.ones(n))
    p2, st2, info = densifier.densify_and_prune(p, st, max_grad=0.5, extent=1.0, bucket=64)
    # 100 - 5 split + 5 clones + 10 split-children = 110 active
    assert info["n_clone"] == 5 and info["n_split"] == 5
    assert info["n_active"] == 100 - 5 + 5 + 10
    assert gaussians.n_points(p2) % 64 == 0
    assert densifier.active_mask(p2).sum() == info["n_active"]


def test_reset_opacity():
    rng = np.random.default_rng(1)
    p = gaussians.create_from_pcd(
        rng.normal(size=(20, 3)).astype(np.float32), rng.uniform(size=(20, 3)).astype(np.float32)
    )
    p2 = densifier.reset_opacity(p)
    s = 1 / (1 + np.exp(-np.asarray(p2.opacity)))
    assert (s <= 0.0101).all()


def test_vanilla_training_improves():
    _, config, data, target, rcfg = synthetic_frame(n_cams=4, w=48, h=48, subdiv=1)
    # init: random point cloud near the sphere
    rng = np.random.default_rng(2)
    pts = rng.normal(scale=0.4, size=(300, 3)).astype(np.float32) + np.array([0, 0, 4], np.float32)
    p = gaussians.create_from_pcd(pts, rng.uniform(size=(300, 3)).astype(np.float32))

    cfg = GSTrainConfig(
        iterations=60, densify_from_iter=10, densify_until_iter=50,
        densification_interval=20, opacity_reset_interval=10_000, bucket=256,
        bg_color=(0.0, 1.0, 0.0), sh_warmup_every=20,
    )
    cam0 = index_camera(data.cameras, 0)
    img0, _ = gaussians.render(p, cam0, bg=(0, 1, 0), raster_config=rcfg)
    p_before = float(psnr(img0, data.gt_images[0]))
    events = []
    p2, hist = train_gaussians(
        p, data.cameras, data.gt_images, cfg, rcfg, spatial_lr_scale=1.0,
        log_fn=lambda e: events.append(e),
    )
    imgN, _ = gaussians.render(p2, cam0, bg=(0, 1, 0), raster_config=rcfg)
    p_after = float(psnr(imgN, data.gt_images[0]))
    assert p_after > p_before, (p_before, p_after)
    assert any(e.get("event") == "densify" for e in events)
    assert np.isfinite(np.asarray(p2.xyz)[densifier.active_mask(p2)]).all()
