"""SuGaR parametrization property tests (SURVEY section 2.4 math)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gaustar_tpu.cameras import Camera
from gaustar_tpu.mesh.primitives import icosphere
from gaustar_tpu.models import sugar
from gaustar_tpu.ops.rasterizer import RasterConfig


def _model(n_g=6, loose=False):
    verts, faces = icosphere(1, radius=0.5, center=(0, 0, 4.0))
    colors = np.random.default_rng(0).uniform(size=(len(verts), 3)).astype(np.float32)
    params, config = sugar.init_sugar(
        verts, faces, vertex_colors=colors, n_gaussians_per_face=n_g, thickness=1e-5
    )
    if loose:
        params, config = sugar.loose_bound(params, config)
    return params, config


def test_barycentric_centers_on_faces():
    params, config = _model()
    centers = np.asarray(sugar.gaussian_centers(params, config))
    faces_verts = np.asarray(params.points)[np.asarray(config.faces)]
    ng = config.n_gaussians_per_face
    # Every center must be a convex combination of its face's vertices.
    bary = np.asarray(config.bary)
    expect = (faces_verts[:, None] * bary[None, :, :, None]).sum(2).reshape(-1, 3)
    np.testing.assert_allclose(centers, expect, atol=1e-6)
    assert centers.shape[0] == len(faces_verts) * ng


def test_frames_orthonormal_and_normal_aligned():
    params, config = _model()
    R = np.asarray(sugar.gaussian_frames(params, config))
    eye = np.eye(3)[None]
    np.testing.assert_allclose(R.transpose(0, 2, 1) @ R, np.broadcast_to(eye, R.shape), atol=1e-5)
    # First column = face normal.
    fv = np.asarray(params.points)[np.asarray(config.faces)]
    n = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    n_rep = np.repeat(n, config.n_gaussians_per_face, axis=0)
    np.testing.assert_allclose(R[:, :, 0], n_rep, atol=1e-5)


def test_scaling_thickness_and_clamps():
    params, config = _model()
    config = dataclasses.replace(config, min_scale=0.01, max_scale=0.02)
    s = np.asarray(sugar.scaling(params, config))
    np.testing.assert_allclose(s[:, 0], 1e-5, rtol=1e-6)
    assert (s[:, 1:] >= 0.01 - 1e-7).all() and (s[:, 1:] <= 0.02 + 1e-7).all()


def test_quaternion_roundtrip_consistency():
    params, config = _model()
    q = sugar.quaternions(params, config)
    from gaustar_tpu.utils.general import quaternion_to_matrix

    R2 = np.asarray(quaternion_to_matrix(q))
    R = np.asarray(sugar.gaussian_frames(params, config))
    np.testing.assert_allclose(R2, R, atol=1e-4)


def test_loose_bind_delta():
    params, config = _model()
    base = np.asarray(sugar.gaussian_centers(params, config))
    params2 = dataclasses.replace(params, delta_t=params.delta_t + 0.1)
    # Without loose bind, delta_t is inert.
    np.testing.assert_allclose(np.asarray(sugar.gaussian_centers(params2, config)), base, atol=1e-7)
    _, config_l = sugar.loose_bound(params2, config)
    moved = np.asarray(sugar.gaussian_centers(params2, config_l))
    np.testing.assert_allclose(moved, base + 0.1, atol=1e-6)


def test_render_and_optimize_step():
    params, config = _model()
    cam = Camera.from_w2c(np.eye(4), 60.0, 60.0, 24.0, 24.0, 48, 48)
    rcfg = RasterConfig(max_pairs=1 << 14, chunk=32, max_per_tile=512, impl="jax")
    img, aux = sugar.render(params, config, cam, bg=(0, 1, 0), sh_deg=0, raster_config=rcfg)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    # sphere covers image center, bg at corner
    assert img[0, 0, 1] > 0.9  # green bg corner
    center = img[24, 24]
    assert not np.allclose(center, [0, 1, 0], atol=0.2)

    # One gradient step against a constant target must reduce loss.
    target = jnp.zeros((48, 48, 3)) + 0.5

    def loss_fn(p):
        im, _ = sugar.render(p, config, cam, bg=(0, 1, 0), sh_deg=0, raster_config=rcfg)
        return ((im - target) ** 2).mean()

    l0, g = jax.value_and_grad(loss_fn)(params)
    p1 = jax.tree.map(lambda x, d: x - 0.1 * d, params, g)
    l1 = loss_fn(p1)
    assert float(l1) < float(l0)
    # vertex gradient must be nonzero: rendering gradients flow to the surface
    assert float(jnp.abs(g.points).max()) > 0.0


def test_depth_render():
    params, config = _model()
    # Near-opaque gaussians so blended depth reads the front surface (with the
    # init opacity 0.1 the depth correctly blends toward the background value).
    from gaustar_tpu.utils.general import inverse_sigmoid

    params = dataclasses.replace(
        params, densities=jnp.full_like(params.densities, inverse_sigmoid(0.98))
    )
    cam = Camera.from_w2c(np.eye(4), 60.0, 60.0, 24.0, 24.0, 48, 48)
    rcfg = RasterConfig(max_pairs=1 << 14, chunk=32, max_per_tile=512, impl="jax")
    depth, _ = sugar.render_depth(
        params, config, cam, max_depth=10.0, raster_config=rcfg, use_solid_surface=True
    )
    depth = np.asarray(depth)
    assert np.isclose(depth[0, 0], 10.0, atol=1e-3)  # background
    assert 3.0 < depth[24, 24] < 4.0  # sphere front surface at z = 4 - 0.5


def test_sh_dc_color_init():
    params, config = _model()
    from gaustar_tpu.ops.sh import sh_to_rgb_dc

    rgb = np.asarray(sh_to_rgb_dc(params.sh_dc[:, 0, :]))
    assert rgb.min() > -0.5 and rgb.max() < 1.5


def test_frames_unit_under_jit():
    """Regression: jnp.linalg.norm miscompiled under whole-graph jit on TPU
    (jax 0.9.0/v5e), leaving "normalized" frame columns with norms up to 14x off
    and corrupting every covariance downstream. utils.general.l2norm (naive
    sqrt-sum-square) replaced it; this asserts frames stay orthonormal INSIDE a
    jit, which is exactly the configuration that broke (eager was always fine).
    On CPU this is belt-and-braces; run on TPU it is the real regression gate."""
    verts, faces = icosphere(3, radius=0.5, center=(0.0, 0.0, 4.0))
    params, config = sugar.init_sugar(verts, faces)

    frames_jit = jax.jit(lambda p: sugar.gaussian_frames(p, config))(params)
    frames_eager = sugar.gaussian_frames(params, config)

    gram = frames_jit @ jnp.swapaxes(frames_jit, 1, 2)
    np.testing.assert_allclose(np.asarray(gram), np.broadcast_to(np.eye(3), gram.shape), atol=1e-5)
    np.testing.assert_allclose(np.asarray(frames_jit), np.asarray(frames_eager), atol=1e-5)
