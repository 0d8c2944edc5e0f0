"""Multi-device (8 virtual CPU devices) camera-sharded training step."""

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

    p1, s1, loss = step(params, opt_state, cam_idx, jnp.int32(1), uw, pre)
    assert np.isfinite(float(loss))

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
