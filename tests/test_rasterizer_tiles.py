"""Parity: tiled XLA rasterizer vs dense oracle (values AND gradients)."""

import jax
import jax.numpy as jnp
import numpy as np

from gaustar_tpu.cameras import Camera
from gaustar_tpu.ops.projection import quat_scale_to_cov3d
from gaustar_tpu.ops.rasterizer import RasterConfig, rasterize


def _camera(w=48, h=32):
    return Camera.from_w2c(np.eye(4), 60.0, 60.0, w / 2.0, h / 2.0, w, h)


def _scene(n=60, seed=0, spread=0.5, z0=4.0):
    rng = np.random.default_rng(seed)
    means = np.concatenate(
        [rng.normal(scale=spread, size=(n, 2)), z0 + rng.uniform(0, 2, size=(n, 1))], axis=1
    ).astype(np.float32)
    scales = np.exp(rng.normal(loc=-2.2, scale=0.4, size=(n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = (1.0 / (1.0 + np.exp(-rng.normal(size=(n,))))).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    return (
        jnp.asarray(means),
        jnp.asarray(scales),
        jnp.asarray(quats),
        jnp.asarray(opac),
        jnp.asarray(colors),
    )


CFG_JAX = RasterConfig(max_pairs=1 << 14, chunk=32, max_per_tile=256, impl="jax")
CFG_DENSE = RasterConfig(impl="dense")


def _render(cfg, means, scales, quats, opac, colors, cam, bg=(0.1, 0.2, 0.3)):
    cov3d = quat_scale_to_cov3d(scales, quats)
    return rasterize(means, cov3d, opac, colors, cam, bg=bg, config=cfg)


def test_tile_matches_dense_forward():
    cam = _camera()
    scene = _scene(80, seed=1)
    img_d, aux_d = _render(CFG_DENSE, *scene, cam)
    img_t, aux_t = _render(CFG_JAX, *scene, cam)
    assert int(aux_t.num_pairs) < CFG_JAX.max_pairs, "capacity overflow invalidates test"
    np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_d), atol=2e-5)
    np.testing.assert_allclose(np.asarray(aux_t.final_T), np.asarray(aux_d.final_T), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(aux_t.n_contrib), np.asarray(aux_d.n_contrib))


def test_tile_matches_dense_gradients():
    cam = _camera(32, 32)
    scene = _scene(40, seed=2, spread=0.35)
    probe = jax.random.normal(jax.random.PRNGKey(0), (32, 32, 3))

    def loss(cfg, *scene):
        img, _ = _render(cfg, *scene, cam)
        return (img * probe).sum()

    g_d = jax.grad(lambda *s: loss(CFG_DENSE, *s), argnums=(0, 1, 2, 3, 4))(*scene)
    g_t = jax.grad(lambda *s: loss(CFG_JAX, *s), argnums=(0, 1, 2, 3, 4))(*scene)
    names = ["means", "scales", "quats", "opac", "colors"]
    for a, b, name in zip(g_d, g_t, names):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4, err_msg=name
        )


def test_means2d_dummy_gradient():
    """The screenspace-points gradient channel used by the densifier."""
    cam = _camera(32, 32)
    means, scales, quats, opac, colors = _scene(20, seed=3, spread=0.3)
    cov3d = quat_scale_to_cov3d(scales, quats)
    dummy = jnp.zeros((means.shape[0], 2))

    def loss(dummy):
        img, _ = rasterize(
            means, cov3d, opac, colors, cam, config=CFG_JAX, means2d_dummy=dummy
        )
        return (img**2).sum()

    g = jax.grad(loss)(dummy)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0.0


def test_capacity_overflow_reported():
    cam = _camera()
    scene = _scene(200, seed=4, spread=0.2)
    cfg = RasterConfig(max_pairs=64, chunk=16, max_per_tile=32, impl="jax")
    _, aux = _render(cfg, *scene, cam)
    assert int(aux.num_pairs) > 64  # truncated render, but flagged


def test_capacity_auto_retry_recovers():
    """Auto-retry from a deliberately tiny capacity yields the un-truncated image."""
    from gaustar_tpu.ops.rasterizer import rasterize_auto

    cam = _camera()
    means, scales, quats, opac, colors = _scene(200, seed=4, spread=0.2)
    cov3d = quat_scale_to_cov3d(scales, quats)
    img_ref, _ = _render(CFG_DENSE, means, scales, quats, opac, colors, cam)

    tiny = RasterConfig(max_pairs=64, chunk=16, max_per_tile=2048, impl="jax")
    img, aux, used = rasterize_auto(
        means, cov3d, opac, colors, cam, bg=(0.1, 0.2, 0.3), config=tiny
    )
    assert used.max_pairs > 64
    assert int(aux.num_pairs) <= used.max_pairs
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref), atol=2e-5)
