"""Multi-camera batched training step (compute_losses_multi).

Semantics contract: a B-camera batch loss/gradient equals the MEAN of the B
single-camera losses/gradients (the camera-DP layout's local analog); B=1 is
bit-identical to compute_losses."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gaustar_tpu.cameras import stack_cameras
from gaustar_tpu.mesh.primitives import uv_sphere
from gaustar_tpu.mesh.topology import build_topology
from gaustar_tpu.models import sugar
from gaustar_tpu.ops.losses import edge_lengths, face_areas_normals
from gaustar_tpu.ops.rasterizer import RasterConfig
from gaustar_tpu.train.refine import (
    FrameData,
    RefineConfig,
    compute_losses,
    compute_losses_multi,
    compute_margins,
)
from gaustar_tpu.utils.synthetic import ring_cameras

W, H = 64, 48


def _scene():
    verts, faces = uv_sphere(7, 9, radius=0.5, center=(0.0, 0.0, 3.0))
    rng = np.random.default_rng(0)
    colors = rng.uniform(0.2, 0.9, size=(len(verts), 3)).astype(np.float32)
    params, config = sugar.init_sugar(verts, faces, vertex_colors=colors)
    cams = ring_cameras(3, w=W, h=H, focal=64.0)
    batch = stack_cameras(cams)
    gt = rng.uniform(size=(3, H, W, 3)).astype(np.float32)
    gt_depth = np.full((3, H, W), 3.0, np.float32)
    topo = build_topology(np.asarray(faces), len(verts))
    ref_len = np.asarray(edge_lengths(jnp.asarray(verts), jnp.asarray(topo.edges)))
    ref_area, _ = face_areas_normals(jnp.asarray(verts), jnp.asarray(faces))
    margins = compute_margins(np.asarray(batch.cx), np.asarray(batch.cy), W, H)
    data = FrameData(
        cameras=batch,
        gt_images=jnp.asarray(gt),
        gt_depths=jnp.asarray(gt_depth),
        margins=jnp.asarray(margins),
        ref_edge_len=jnp.asarray(ref_len),
        ref_area=jnp.asarray(ref_area),
        edges=jnp.asarray(topo.edges),
        adj_faces=jnp.asarray(topo.adj_faces),
    )
    rcfg = RasterConfig(max_pairs=65536, max_padded=65536, chunk=8, impl="jax")
    return params, config, data, rcfg


@pytest.mark.slow  # scale/budget test (fast tier keeps a cheaper sibling)
def test_multi_camera_batch_equals_mean_of_singles():
    params, config, data, rcfg = _scene()
    cfg = RefineConfig(num_iterations=100, do_sh_warmup=False)
    it = jnp.int32(5)
    uw = jnp.zeros((params.scales.shape[0],), jnp.float32)
    pre = params.sh_dc[:, 0, :] * 0.0

    def single(i):
        return compute_losses(params, config, data, jnp.int32(i), it, cfg, rcfg, 2, uw, pre)

    def multi(idxs):
        return compute_losses_multi(
            params, config, data, jnp.asarray(idxs, jnp.int32), it, cfg, rcfg, 2, uw, pre
        )

    l0, d0 = single(0)
    l1, _ = single(1)

    lm1, dm1 = multi([0])  # B=1: bit-identical
    assert float(lm1) == float(l0)
    assert int(dm1["num_pairs"]) == int(d0["num_pairs"])

    lm, dm = multi([0, 1])  # B=2: mean of the singles
    np.testing.assert_allclose(float(lm), (float(l0) + float(l1)) / 2.0, rtol=1e-6)

    # Gradient contract: grad of the batch = mean of single-camera grads.
    g0 = jax.grad(lambda p: compute_losses(p, config, data, jnp.int32(0), it, cfg, rcfg, 2, uw, pre)[0])(params)
    g1 = jax.grad(lambda p: compute_losses(p, config, data, jnp.int32(1), it, cfg, rcfg, 2, uw, pre)[0])(params)
    gm = jax.grad(
        lambda p: compute_losses_multi(
            p, config, data, jnp.asarray([0, 1], jnp.int32), it, cfg, rcfg, 2, uw, pre
        )[0]
    )(params)
    for a, b, c in zip(
        jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(gm)
    ):
        want = (np.asarray(a) + np.asarray(b)) / 2.0
        np.testing.assert_allclose(np.asarray(c), want, rtol=2e-5, atol=1e-7)


def test_train_step_accepts_camera_batch():
    from gaustar_tpu.train.optimizer import OptimizationParams, make_sugar_optimizer
    from gaustar_tpu.train.refine import make_train_step

    params, config, data, rcfg = _scene()
    cfg = RefineConfig(num_iterations=100, do_sh_warmup=False)
    optimizer = make_sugar_optimizer(OptimizationParams(iterations=100), 1.0)
    opt_state = optimizer.init(params)
    step = make_train_step(config, data, cfg, rcfg, optimizer)
    uw = jnp.zeros((params.scales.shape[0],), jnp.float32)
    pre = params.sh_dc[:, 0, :] * 0.0
    p2, o2, loss, ld = step(
        params, opt_state, jnp.asarray([0, 2], jnp.int32), jnp.int32(1), 0, uw, pre
    )
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(p2.points)).all()


def test_scan_batch_matches_unroll():
    """compute_losses_multi_scan: identical values AND gradients to the
    trace-time-unrolled compute_losses_multi (flat-compile path for B >= 4)."""
    from gaustar_tpu.train.refine import compute_losses_multi_scan

    params, config, data, rcfg = _scene()
    cfg = RefineConfig(num_iterations=100, do_sh_warmup=False, use_sh_reg=True)
    it = jnp.int32(5)
    uw = jnp.zeros((params.scales.shape[0],), jnp.float32)
    pre = params.sh_dc[:, 0, :] * 0.0
    idxs = jnp.asarray([0, 1, 2], jnp.int32)

    lu, du = compute_losses_multi(params, config, data, idxs, it, cfg, rcfg, 2, uw, pre)
    ls, ds = compute_losses_multi_scan(params, config, data, idxs, it, cfg, rcfg, 2, uw, pre)
    np.testing.assert_allclose(float(ls), float(lu), rtol=1e-6)
    assert int(ds["num_pairs"]) == int(du["num_pairs"])
    assert int(ds["num_padded"]) == int(du["num_padded"])
    for k in du:
        np.testing.assert_allclose(
            float(ds[k]), float(du[k]), rtol=1e-5, atol=1e-7, err_msg=k
        )

    gu = jax.grad(
        lambda p: compute_losses_multi(p, config, data, idxs, it, cfg, rcfg, 2, uw, pre)[0]
    )(params)
    gs = jax.grad(
        lambda p: compute_losses_multi_scan(p, config, data, idxs, it, cfg, rcfg, 2, uw, pre)[0]
    )(params)
    for a, b in zip(jax.tree_util.tree_leaves(gu), jax.tree_util.tree_leaves(gs)):
        # atol 1e-6: scan reassociates the f32 mean (measured worst diff 6e-7
        # on a grad of magnitude 1.3 — accumulation-order noise, not a bug).
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-5, atol=1e-6)


def test_train_step_scan_batch_impl():
    from gaustar_tpu.train.optimizer import OptimizationParams, make_sugar_optimizer
    from gaustar_tpu.train.refine import make_train_step

    params, config, data, rcfg = _scene()
    cfg = RefineConfig(num_iterations=100, do_sh_warmup=False, batch_impl="scan")
    optimizer = make_sugar_optimizer(OptimizationParams(iterations=100), 1.0)
    opt_state = optimizer.init(params)
    step = make_train_step(config, data, cfg, rcfg, optimizer)
    uw = jnp.zeros((params.scales.shape[0],), jnp.float32)
    pre = params.sh_dc[:, 0, :] * 0.0
    p2, o2, loss, ld = step(
        params, opt_state, jnp.asarray([0, 2], jnp.int32), jnp.int32(1), 0, uw, pre
    )
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(p2.points)).all()
