"""Oracle rasterizer behavior + gradient sanity (finite differences)."""

import jax
import jax.numpy as jnp
import numpy as np

from gaustar_tpu.cameras import Camera
from gaustar_tpu.ops.projection import preprocess, quat_scale_to_cov3d
from gaustar_tpu.ops.rasterizer_ref import render_dense


def _camera(w=48, h=32):
    return Camera.from_w2c(np.eye(4), 60.0, 60.0, w / 2.0, h / 2.0, w, h)


def _scene(n=40, seed=0, spread=0.5, z0=4.0):
    rng = np.random.default_rng(seed)
    means = np.concatenate(
        [rng.normal(scale=spread, size=(n, 2)), z0 + rng.uniform(0, 2, size=(n, 1))], axis=1
    ).astype(np.float32)
    scales = np.exp(rng.normal(loc=-2.5, scale=0.3, size=(n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = (1.0 / (1.0 + np.exp(-rng.normal(size=(n,))))).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    return means, scales, quats, opac, colors


def test_empty_scene_is_background():
    cam = _camera()
    means = np.array([[0.0, 0.0, -5.0]], np.float32)  # behind camera -> culled
    cov3d = quat_scale_to_cov3d(jnp.asarray([[0.1, 0.1, 0.1]]), jnp.asarray([[1.0, 0, 0, 0]]))
    img, out = render_dense(jnp.asarray(means), cov3d, jnp.asarray([0.9]), jnp.asarray([[1.0, 0, 0]]), cam, bg=(0.0, 1.0, 0.0))
    assert int(out.radii[0]) == 0
    np.testing.assert_allclose(np.asarray(img), np.broadcast_to([0, 1, 0], img.shape), atol=1e-6)


def test_single_gaussian_peak():
    cam = _camera()
    means = jnp.asarray([[0.0, 0.0, 5.0]])
    cov3d = quat_scale_to_cov3d(jnp.asarray([[0.3, 0.3, 0.3]]), jnp.asarray([[1.0, 0, 0, 0]]))
    opac = jnp.asarray([0.8])
    color = jnp.asarray([[1.0, 0.5, 0.25]])
    img, out = render_dense(means, cov3d, opac, color, cam, bg=(0.0, 0.0, 0.0))
    # The gaussian center projects to pixel ((W-1)/2, (H-1)/2) = (23.5, 15.5);
    # at pixel (24, 16) the falloff is tiny -> value close to alpha*color.
    v = np.asarray(img)[16, 24]
    assert v[0] > 0.7 and v[0] <= 0.8 + 1e-5
    np.testing.assert_allclose(v / v[0], [1.0, 0.5, 0.25], rtol=1e-4)


def test_depth_ordering_occlusion():
    cam = _camera()
    # Two overlapping gaussians; the near one is red, far one blue.
    means = jnp.asarray([[0.0, 0.0, 3.0], [0.0, 0.0, 6.0]])
    scales = jnp.asarray([[0.2, 0.2, 0.2], [0.4, 0.4, 0.4]])
    quats = jnp.asarray([[1.0, 0, 0, 0], [1.0, 0, 0, 0]])
    cov3d = quat_scale_to_cov3d(scales, quats)
    opac = jnp.asarray([0.95, 0.95])
    color = jnp.asarray([[1.0, 0, 0], [0.0, 0, 1.0]])
    img, _ = render_dense(means, cov3d, opac, color, cam)
    v = np.asarray(img)[16, 24]
    assert v[0] > 0.9  # near red dominates
    assert v[2] < 0.08  # far blue mostly occluded
    # Swap order in memory: result must be invariant (sorted by depth).
    img2, _ = render_dense(means[::-1], cov3d[::-1], opac[::-1], color[::-1], cam)
    np.testing.assert_allclose(np.asarray(img2), np.asarray(img), atol=1e-6)


def test_final_T_and_contrib():
    cam = _camera()
    means = jnp.asarray([[0.0, 0.0, 5.0]])
    cov3d = quat_scale_to_cov3d(jnp.asarray([[0.3, 0.3, 0.3]]), jnp.asarray([[1.0, 0, 0, 0]]))
    _, out = render_dense(means, cov3d, jnp.asarray([0.5]), jnp.asarray([[1.0, 1, 1]]), cam)
    t = np.asarray(out.final_T)[16, 24]
    assert 0.49 < t < 0.51
    assert int(np.asarray(out.n_contrib)[16, 24]) == 1
    # A corner pixel far outside the gaussian's tile rect sees nothing.
    assert int(np.asarray(out.n_contrib)[0, 0]) == 0


def test_gradients_finite_difference():
    cam = _camera(32, 24)
    means, scales, quats, opac, colors = _scene(12, seed=3, spread=0.3)
    key = jax.random.PRNGKey(0)
    probe = jax.random.normal(key, (24, 32, 3))

    def loss_fn(means, scales, quats, opac, colors):
        cov3d = quat_scale_to_cov3d(jnp.asarray(scales), jnp.asarray(quats))
        img, _ = render_dense(jnp.asarray(means), cov3d, jnp.asarray(opac), jnp.asarray(colors), cam)
        return (img * probe).sum()

    args = (means, scales, quats, opac, colors)
    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(*args)

    rng = np.random.default_rng(7)
    eps_by_param = {"means": 1e-3, "scales": 1e-4, "quats": 1e-3, "opac": 1e-3, "colors": 1e-2}
    for ai, name in enumerate(["means", "scales", "quats", "opac", "colors"]):
        a = args[ai]
        direction = rng.normal(size=a.shape).astype(np.float32)
        direction /= np.linalg.norm(direction)
        eps = eps_by_param[name]
        ap = [np.asarray(x, np.float64).copy() for x in args]
        am = [np.asarray(x, np.float64).copy() for x in args]
        ap[ai] = ap[ai] + eps * direction
        am[ai] = am[ai] - eps * direction
        fp = float(loss_fn(*[jnp.asarray(x, jnp.float32) for x in ap]))
        fm = float(loss_fn(*[jnp.asarray(x, jnp.float32) for x in am]))
        fd = (fp - fm) / (2 * eps)
        ad = float((np.asarray(grads[ai]) * direction).sum())
        # f32 render, and the tile-rect / alpha-cutoff masks are genuinely
        # discontinuous (same as CUDA) -> loose tolerance; signs/magnitudes must
        # agree. Exact gradient parity is covered by tile-vs-dense autodiff tests.
        assert np.isclose(fd, ad, rtol=1.2e-1, atol=5e-3), (name, fd, ad)


def test_preprocess_radius_and_cull():
    cam = _camera()
    means = jnp.asarray([[0.0, 0.0, 5.0], [0.0, 0.0, 0.1]])  # second violates near plane
    cov3d = quat_scale_to_cov3d(
        jnp.asarray([[0.3, 0.3, 0.3]] * 2), jnp.asarray([[1.0, 0, 0, 0]] * 2)
    )
    g = preprocess(means, cov3d, jnp.asarray([0.5, 0.5]), jnp.asarray([[1.0, 1, 1]] * 2), cam)
    assert int(g.radius[0]) > 0
    assert int(g.radius[1]) == 0
    assert int(g.tiles_touched[1]) == 0
