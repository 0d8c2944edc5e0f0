"""Gaussian-axis model parallelism TRAINS: gradient parity of the 2D
("cam", "gauss") sharded step against the single-device step (VERDICT r2
item 4). 8 virtual CPU devices (conftest), 2x4 mesh.
"""

import pytest
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax

from gaustar_tpu.cameras import stack_cameras
from gaustar_tpu.mesh.primitives import icosphere
from gaustar_tpu.mesh.topology import build_topology
from gaustar_tpu.models import sugar
from gaustar_tpu.ops.losses import edge_lengths, face_areas_normals
from gaustar_tpu.ops.rasterizer import RasterConfig
from gaustar_tpu.parallel import launch
from gaustar_tpu.parallel.gauss2d import make_gauss2d_train_step
from gaustar_tpu.train.refine import FrameData, RefineConfig, compute_losses, compute_margins
from gaustar_tpu.utils.synthetic import ring_cameras

W = H = 64


def _scene(impl="jax"):
    rng = np.random.default_rng(0)
    verts, faces = icosphere(2, radius=0.5, center=(0, 0, 4.0))  # 320 faces % 4 == 0
    colors = rng.uniform(0.2, 0.9, size=(len(verts), 3)).astype(np.float32)
    params, config = sugar.init_sugar(verts, faces, vertex_colors=colors)

    cams = stack_cameras(ring_cameras(2, w=W, h=H, focal=80.0))
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    disc = ((xx - W / 2) ** 2 + (yy - H / 2) ** 2) < 14.0**2
    gt = np.where(disc[..., None], 0.6, np.array([0.0, 1.0, 0.0], np.float32))
    gt_img = np.broadcast_to(gt, (2, H, W, 3)).astype(np.float32)
    gt_depth = np.broadcast_to(np.where(disc, 4.0, 10.5).astype(np.float32), (2, H, W))

    topo = build_topology(faces, len(verts))
    el = np.asarray(edge_lengths(jnp.asarray(verts), jnp.asarray(topo.edges)))
    area, _ = face_areas_normals(jnp.asarray(verts), jnp.asarray(faces))
    # Off-kink reference areas: at EXACTLY area == ref_area the area-iso |.|
    # subgradient sign flips with last-ulp fusion noise, which is not a
    # gradient-parity statement (both signs are valid subgradients).
    area = np.asarray(area) * 1.02
    margins = compute_margins(np.asarray(cams.cx), np.asarray(cams.cy), W, H)
    data = FrameData(
        cameras=cams, gt_images=jnp.asarray(gt_img), gt_depths=jnp.asarray(gt_depth),
        margins=jnp.asarray(margins), ref_edge_len=jnp.asarray(el),
        ref_area=jnp.asarray(np.asarray(area)), edges=jnp.asarray(topo.edges),
        adj_faces=jnp.asarray(topo.adj_faces),
    )
    rcfg = RasterConfig(
        max_pairs=1 << 14, max_padded=1 << 15, chunk=32, max_per_tile=1024, impl=impl
    )
    return params, config, data, rcfg


def _single_device_mean_grads(params, config, data, rcfg, cfg, sh_deg=1):
    """Mean over the 2 cameras of jax.grad(compute_losses) — the reference."""
    uw = jnp.zeros((params.scales.shape[0],), jnp.float32)
    pre = params.sh_dc[:, 0, :] * 0.0

    def loss_c(p, c):
        l, _ = compute_losses(
            p, config, data, jnp.int32(c), jnp.int32(1), cfg, rcfg, sh_deg, uw, pre
        )
        return l

    losses, grads = [], []
    for c in range(2):
        l, g = jax.value_and_grad(loss_c)(params, c)
        losses.append(float(l))
        grads.append(g)
    mean_g = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, grads[0], grads[1])
    return float(np.mean(losses)), mean_g


def _sharded_grads(params, config, data, rcfg, cfg, gauss=4, sh_deg=1):
    """Recover the sharded step's gradients via an SGD(1.0) step:
    grads = params_before - params_after."""
    mesh = launch.make_mesh(gauss=gauss)
    optimizer = optax.sgd(learning_rate=1.0)
    opt_state = optimizer.init(params)
    step = make_gauss2d_train_step(config, data, cfg, rcfg, optimizer, mesh)(sh_deg=sh_deg)

    n_cam = mesh.shape["cam"]
    cam_idx = jnp.zeros((n_cam, 1), jnp.int32)  # each row: its local camera 0
    uw = jnp.zeros((params.scales.shape[0],), jnp.float32)
    pre = params.sh_dc[:, 0, :] * 0.0
    p1, _, loss, caps = step(params, opt_state, cam_idx, jnp.int32(1), uw, pre)
    grads = jax.tree_util.tree_map(lambda a, b: a - b, params, p1)
    return float(loss), grads, caps


@pytest.mark.slow  # scale/budget test (fast tier keeps a cheaper sibling)
def test_gauss2d_gradient_parity_jax_blend():
    params, config, data, rcfg = _scene(impl="jax")
    cfg = RefineConfig(num_iterations=100, loose_bind_from=10**9, do_sh_warmup=False)

    loss_ref, g_ref = _single_device_mean_grads(params, config, data, rcfg, cfg)
    loss_sh, g_sh, caps = _sharded_grads(params, config, data, rcfg, cfg)

    assert np.isfinite(loss_sh)
    np.testing.assert_allclose(loss_sh, loss_ref, rtol=1e-4)
    assert int(caps["num_pairs"]) > 0

    for name in ("points", "scales", "complex2d", "densities", "sh_dc", "sh_rest"):
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(g_sh, name))
        scale = np.abs(a).max() + 1e-12
        # atol floor 1e-6: grads are recovered as params_before - params_after
        # (f32), so tiny gradients on O(1) params carry ~eps(param) noise.
        np.testing.assert_allclose(
            b, a, rtol=2e-4, atol=max(2e-4 * scale, 1e-6),
            err_msg=f"gradient mismatch in {name}",
        )


@pytest.mark.slow  # scale/budget test (fast tier keeps a cheaper sibling)
def test_gauss2d_gradient_parity_pallas_strip_blend():
    """Same parity through the PRODUCTION Pallas strip blend (interpret mode on
    CPU devices — the kernel path the chips run, incl. tile_base offsets)."""
    params, config, data, rcfg = _scene(impl="pallas")
    cfg = RefineConfig(num_iterations=100, loose_bind_from=10**9, do_sh_warmup=False)

    ref_rcfg = dataclasses.replace(rcfg, impl="jax")
    loss_ref, g_ref = _single_device_mean_grads(params, config, data, ref_rcfg, cfg)
    loss_sh, g_sh, _ = _sharded_grads(params, config, data, rcfg, cfg)

    np.testing.assert_allclose(loss_sh, loss_ref, rtol=1e-4)
    for name in ("points", "scales", "densities", "sh_dc"):
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(g_sh, name))
        scale = np.abs(a).max() + 1e-12
        # atol floor 1e-6: grads are recovered as params_before - params_after
        # (f32), so tiny gradients on O(1) params carry ~eps(param) noise.
        np.testing.assert_allclose(
            b, a, rtol=2e-4, atol=max(2e-4 * scale, 1e-6),
            err_msg=f"gradient mismatch in {name}",
        )


def test_gauss2d_trains():
    """Loss must decrease over a few sharded steps (the path actually TRAINS)."""
    from gaustar_tpu.train.optimizer import OptimizationParams, make_sugar_optimizer

    params, config, data, rcfg = _scene(impl="jax")
    cfg = RefineConfig(num_iterations=100, loose_bind_from=10**9, do_sh_warmup=False)
    mesh = launch.make_mesh(gauss=4)
    optimizer = make_sugar_optimizer(OptimizationParams(iterations=100), 1.0)
    opt_state = optimizer.init(params)
    step = make_gauss2d_train_step(config, data, cfg, rcfg, optimizer, mesh)(sh_deg=1)

    cam_idx = jnp.zeros((mesh.shape["cam"], 1), jnp.int32)
    uw = jnp.zeros((params.scales.shape[0],), jnp.float32)
    pre = params.sh_dc[:, 0, :] * 0.0
    losses = []
    p, s = params, opt_state
    for it in range(1, 9):
        p, s, loss, _ = step(p, s, cam_idx, jnp.int32(it), uw, pre)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
