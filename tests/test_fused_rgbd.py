"""Fused RGB+depth rendering (4 blend channels) vs the reference's two passes.

The reference renders each training iteration twice — RGB (refine.py:552-564)
and depth-as-color with bg=max_depth (refine.py:599-632). Both blends use
identical per-pair alpha weights, so sugar.render_rgbd carries depth as a 4th
feature channel in ONE pass. These tests pin that fusion to the two-pass path
for values and gradients, on both blend implementations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaustar_tpu.mesh.primitives import uv_sphere
from gaustar_tpu.models import sugar
from gaustar_tpu.ops.rasterizer import RasterConfig
from gaustar_tpu.utils.synthetic import ring_cameras


@pytest.fixture(scope="module")
def scene():
    verts, faces = uv_sphere(9, 12, radius=0.6, center=(0.0, 0.0, 4.0))
    colors = np.random.default_rng(0).uniform(0.2, 0.9, (len(verts), 3)).astype(np.float32)
    params, config = sugar.init_sugar(verts, faces, vertex_colors=colors)
    cam = ring_cameras(1, w=64, h=48, focal=60.0)[0]
    return params, config, cam


@pytest.mark.parametrize("impl", ["jax", "pallas"])
def test_fused_matches_two_pass(scene, impl):
    params, config, cam = scene
    rc_sep = RasterConfig(max_pairs=1 << 14, chunk=8, impl="jax")
    rc = RasterConfig(max_pairs=1 << 14, chunk=8, impl=impl)

    img, _ = sugar.render(params, config, cam, bg=(0.0, 1.0, 0.0), sh_deg=2, raster_config=rc_sep)
    dep, _ = sugar.render_depth(params, config, cam, max_depth=10.0, raster_config=rc_sep)
    rgb_f, dep_f, aux = sugar.render_rgbd(
        params, config, cam, bg=(0.0, 1.0, 0.0), sh_deg=2, max_depth=10.0, raster_config=rc
    )
    tol = 0.0 if impl == "jax" else 1e-5
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(img), atol=tol)
    np.testing.assert_allclose(np.asarray(dep_f), np.asarray(dep), atol=tol)
    assert int(aux.num_pairs) > 0


@pytest.mark.parametrize("impl", ["jax", "pallas"])
def test_fused_gradients_match_two_pass(scene, impl):
    params, config, cam = scene
    rc_sep = RasterConfig(max_pairs=1 << 14, chunk=8, impl="jax")
    rc = RasterConfig(max_pairs=1 << 14, chunk=8, impl=impl)

    def loss_sep(p):
        i, _ = sugar.render(p, config, cam, bg=(0.0, 1.0, 0.0), sh_deg=2, raster_config=rc_sep)
        d, _ = sugar.render_depth(p, config, cam, max_depth=10.0, raster_config=rc_sep)
        return (i**2).mean() + (d**2).mean()

    def loss_fused(p):
        i, d, _ = sugar.render_rgbd(
            p, config, cam, bg=(0.0, 1.0, 0.0), sh_deg=2, max_depth=10.0, raster_config=rc
        )
        return (i**2).mean() + (d**2).mean()

    g_sep = jax.grad(loss_sep)(params)
    g_fused = jax.grad(loss_fused)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_sep), jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
