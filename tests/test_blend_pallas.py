"""Pallas blend kernels (interpret mode on CPU) vs the XLA tile path and oracle."""

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
    return tuple(jnp.asarray(a) for a in (means, scales, quats, opac, colors))


CFG_PALLAS = RasterConfig(max_pairs=1 << 14, chunk=32, impl="pallas")
CFG_JAX = RasterConfig(max_pairs=1 << 14, chunk=32, max_per_tile=256, impl="jax")


def _render(cfg, scene, cam, bg=(0.1, 0.2, 0.3)):
    means, scales, quats, opac, colors = scene
    cov3d = quat_scale_to_cov3d(scales, quats)
    return rasterize(means, cov3d, opac, colors, cam, bg=bg, config=cfg)


def test_pallas_forward_matches_jax():
    cam = _camera()
    scene = _scene(80, seed=1)
    img_j, aux_j = _render(CFG_JAX, scene, cam)
    img_p, aux_p = _render(CFG_PALLAS, scene, cam)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_j), atol=3e-5)
    np.testing.assert_allclose(np.asarray(aux_p.final_T), np.asarray(aux_j.final_T), atol=3e-5)
    np.testing.assert_array_equal(np.asarray(aux_p.n_contrib), np.asarray(aux_j.n_contrib))


def test_pallas_gradients_match_jax():
    cam = _camera(32, 32)
    scene = _scene(40, seed=2, spread=0.35)
    probe = jax.random.normal(jax.random.PRNGKey(0), (32, 32, 3))

    def loss(cfg, scene):
        img, _ = _render(cfg, scene, cam)
        return (img * probe).sum()

    g_j = jax.grad(lambda s: loss(CFG_JAX, s))(scene)
    g_p = jax.grad(lambda s: loss(CFG_PALLAS, s))(scene)
    names = ["means", "scales", "quats", "opac", "colors"]
    for a, b, name in zip(g_j, g_p, names):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4, err_msg=name
        )


def test_pallas_background_gradient():
    """Gradient through final_T (background/depth compositing path)."""
    cam = _camera(32, 32)
    scene = _scene(25, seed=5, spread=0.3)

    def loss(cfg, scene):
        _, aux = _render(cfg, scene, cam, bg=(0, 0, 0))
        return (aux.final_T**2).sum()

    g_j = jax.grad(lambda s: loss(CFG_JAX, s))(scene)
    g_p = jax.grad(lambda s: loss(CFG_PALLAS, s))(scene)
    for a, b in zip(g_j, g_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4)


def test_pallas_empty_tiles():
    """Tiles with zero pairs must render pure background."""
    cam = _camera(64, 48)
    means = jnp.asarray([[0.0, 0.0, 5.0]])
    cov3d = quat_scale_to_cov3d(jnp.asarray([[0.05, 0.05, 0.05]]), jnp.asarray([[1.0, 0, 0, 0]]))
    img, _ = rasterize(
        means, cov3d, jnp.asarray([0.9]), jnp.asarray([[1.0, 0, 0]]), cam,
        bg=(0.0, 1.0, 0.0), config=CFG_PALLAS,
    )
    corner = np.asarray(img)[0, 0]
    np.testing.assert_allclose(corner, [0.0, 1.0, 0.0], atol=1e-6)


def test_active_tile_compaction_matches_dense():
    """rasterize with max_active_tiles == rasterize dense: values AND grads."""
    import numpy as np
    from gaustar_tpu.ops.rasterizer import RasterConfig, rasterize
    from gaustar_tpu.utils.synthetic import random_gaussian_scene, ring_cameras
    from gaustar_tpu.ops.projection import quat_scale_to_cov3d

    means, scales, quats, opac, colors = random_gaussian_scene(300, seed=5)
    cam = ring_cameras(1, w=96, h=64, focal=110.0)[0]
    base = RasterConfig(max_pairs=1 << 14, chunk=32, impl="pallas")
    compact = RasterConfig(
        max_pairs=1 << 14, chunk=32, impl="pallas", max_active_tiles=24
    )

    def loss(cfg, m, s, q, o, c):
        cov = quat_scale_to_cov3d(s, q)
        img, aux = rasterize(m, cov, o, c, cam, bg=(0.1, 0.2, 0.3), config=cfg)
        return (img * jnp.cos(jnp.arange(img.size).reshape(img.shape))).sum(), (img, aux)

    args = (means, scales, quats, opac, colors)
    (_, (img0, aux0)), g0 = jax.value_and_grad(
        lambda *a: loss(base, *a), argnums=(0, 3), has_aux=True
    )(*args)
    n_act = int(aux0.num_active)
    assert 0 < n_act <= 24, f"scene should fit the compaction cap, got {n_act}"
    (_, (img1, aux1)), g1 = jax.value_and_grad(
        lambda *a: loss(compact, *a), argnums=(0, 3), has_aux=True
    )(*args)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img0), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(aux1.n_contrib), np.asarray(aux0.n_contrib))
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6)
