"""Multi-device (8 virtual CPU devices) camera-sharded training step."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from gaustar_tpu.parallel.sharding import make_camera_mesh, make_sharded_train_step
from gaustar_tpu.train.optimizer import OptimizationParams, make_sugar_optimizer
from gaustar_tpu.train.refine import RefineConfig, compute_losses

from helpers import synthetic_frame


def test_sharded_step_runs_and_matches_single():
    n_dev = min(4, jax.device_count())
    assert jax.device_count() >= 2, "conftest must provide 8 virtual devices"
    params, config, data, target, rcfg = synthetic_frame(n_cams=n_dev)
    cfg = RefineConfig(num_iterations=10, loose_bind_from=10_000)
    optimizer = make_sugar_optimizer(OptimizationParams(), 1.0)
    opt_state = optimizer.init(params)

    mesh = make_camera_mesh(n_dev)
    make_step = make_sharded_train_step(config, data, cfg, rcfg, optimizer, mesh)
    step = make_step(sh_deg=0)

    cam_idx = jnp.zeros((n_dev, 1), jnp.int32)  # each device: its own local camera 0
    n_g = params.scales.shape[0]
    uw = jnp.zeros((n_g,), jnp.float32)
    pre = params.sh_dc[:, 0, :] * 0.0

    p1, s1, loss, caps = step(params, opt_state, cam_idx, jnp.int32(1), uw, pre)
    assert np.isfinite(float(loss))
    # Capacity telemetry (pmax over the mesh) must reach the host so the driver
    # can auto-retry on pair-buffer overflow (ADVICE r2).
    assert int(caps["num_pairs"]) > 0
    assert int(caps["num_padded"]) >= int(caps["num_pairs"])
    assert int(caps["num_pairs"]) <= rcfg.max_pairs

    # The sharded mean loss must equal the mean of the per-camera losses.
    singles = []
    for c in range(n_dev):
        l, _ = compute_losses(
            params, config, data, jnp.int32(c), jnp.int32(1), cfg, rcfg, 0, uw, pre
        )
        singles.append(float(l))
    assert np.isclose(float(loss), np.mean(singles), rtol=1e-4), (float(loss), singles)

    # A second step must actually change parameters everywhere.
    assert not np.allclose(np.asarray(p1.points), np.asarray(params.points))
    assert not np.allclose(np.asarray(p1.sh_dc), np.asarray(params.sh_dc))


@pytest.mark.slow  # scale/budget test (fast tier keeps a cheaper sibling)
def test_gauss_sharded_render_matches_single_device():
    """Gaussian-axis model parallelism: 8-device sharded render == 1-device."""
    from gaustar_tpu.cameras import Camera
    from gaustar_tpu.ops.projection import quat_scale_to_cov3d
    from gaustar_tpu.ops.rasterizer import RasterConfig, rasterize
    from gaustar_tpu.parallel.gauss_shard import make_gauss_mesh, render_gauss_sharded

    n_dev = min(8, jax.device_count())
    rng = np.random.default_rng(7)
    n = 150  # deliberately not divisible by 8 (exercises padding)
    means = np.concatenate(
        [rng.normal(scale=0.5, size=(n, 2)), 4.0 + rng.uniform(0, 2, size=(n, 1))], axis=1
    ).astype(np.float32)
    scales = np.exp(rng.normal(loc=-2.2, scale=0.4, size=(n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = (1.0 / (1.0 + np.exp(-rng.normal(size=(n,))))).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    cov3d = quat_scale_to_cov3d(jnp.asarray(scales), jnp.asarray(quats))
    cam = Camera.from_w2c(np.eye(4), 60.0, 60.0, 24.0, 32.0, 48, 64)
    bg = (0.1, 0.2, 0.3)

    cfg = RasterConfig(max_pairs=1 << 14, chunk=32, max_per_tile=512, impl="jax")
    img_ref, aux = rasterize(
        jnp.asarray(means), cov3d, jnp.asarray(opac), jnp.asarray(colors), cam, bg=bg, config=cfg
    )
    assert int(aux.num_pairs) < cfg.max_pairs

    mesh = make_gauss_mesh(n_dev)
    img, num_pairs = render_gauss_sharded(
        jnp.asarray(means), cov3d, jnp.asarray(opac), jnp.asarray(colors), cam, mesh,
        bg=bg, max_pairs_per_device=1 << 12, max_per_tile=512,
    )
    assert int(num_pairs) == int(aux.num_pairs)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref), atol=2e-5)
