import numpy as np
import jax.numpy as jnp

from gaustar_tpu.cameras import Camera, index_camera, stack_cameras


def _random_w2c(rng):
    # Random rotation via QR.
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    w2c = np.eye(4)
    w2c[:3, :3] = q
    w2c[:3, 3] = rng.normal(size=3)
    return w2c


def test_view_matches_w2c():
    rng = np.random.default_rng(0)
    w2c = _random_w2c(rng)
    cam = Camera.from_w2c(w2c, 100.0, 100.0, 32.0, 24.0, 64, 48)
    np.testing.assert_allclose(np.asarray(cam.view), w2c, atol=1e-5)
    # camera center maps to origin of camera frame
    center = np.asarray(cam.camera_center)
    p = w2c[:3, :3] @ center + w2c[:3, 3]
    np.testing.assert_allclose(p, 0.0, atol=1e-5)


def test_projection_center_point():
    # Camera at origin looking down +z with centered principal point:
    cam = Camera.from_w2c(np.eye(4), 100.0, 100.0, 32.0, 24.0, 64, 48)
    p = jnp.asarray([0.0, 0.0, 5.0])
    hom = cam.full_proj @ jnp.concatenate([p, jnp.ones(1)])
    ndc = hom[:3] / hom[3]
    np.testing.assert_allclose(np.asarray(ndc[:2]), 0.0, atol=1e-6)
    # pixel = ndc2Pix(0, W) = (W-1)/2
    px = ((ndc[0] + 1) * 64 - 1) * 0.5
    assert np.isclose(float(px), 31.5)


def test_projection_principal_point_shift():
    # Shift cx by +8 px on a 64-wide (min-dim 48) image: the SuGaR/p3d NDC convention
    # adds (cx - W/2)/(min/2) to ndc x BEFORE w-division times z... verify the
    # resulting on-axis pixel shift equals shift*W/min (sugar_model.py:1160-1161).
    cam = Camera.from_w2c(np.eye(4), 100.0, 100.0, 40.0, 24.0, 64, 48)
    p = jnp.asarray([0.0, 0.0, 5.0])
    hom = cam.full_proj @ jnp.concatenate([p, jnp.ones(1)])
    ndc = hom[:3] / hom[3]
    px = ((ndc[0] + 1) * 64 - 1) * 0.5
    want = 31.5 + 8.0 * 64.0 / 48.0
    assert np.isclose(float(px), want, rtol=1e-5)


def test_fov_edge_point():
    cam = Camera.from_w2c(np.eye(4), 100.0, 100.0, 32.0, 24.0, 64, 48)
    # point at the right edge of the fov: x/z = tanfovx
    tanx = float(cam.tanfovx)
    p = jnp.asarray([tanx * 5.0, 0.0, 5.0])
    hom = cam.full_proj @ jnp.concatenate([p, jnp.ones(1)])
    ndc = float(hom[0] / hom[3])
    assert np.isclose(ndc, 1.0, rtol=1e-5)


def test_stack_and_index():
    rng = np.random.default_rng(1)
    cams = [
        Camera.from_w2c(_random_w2c(rng), 100.0, 110.0, 32.0, 24.0, 64, 48) for _ in range(3)
    ]
    batch = stack_cameras(cams)
    one = index_camera(batch, 1)
    np.testing.assert_allclose(np.asarray(one.view), np.asarray(cams[1].view), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(one.full_proj), np.asarray(cams[1].full_proj), atol=1e-5
    )


def test_downscale():
    cam = Camera.from_w2c(np.eye(4), 100.0, 100.0, 32.0, 24.0, 64, 48)
    half = cam.downscale(2)
    assert half.width == 32 and half.height == 24
    assert np.isclose(float(half.tanfovx), float(cam.tanfovx))


def test_rig_cameras_multi_elevation():
    """rig_cameras: n cameras over `rows` elevation rings, all looking at the
    scene center (the ActorsHQ cylinder-rig geometry, cameras.py:20)."""
    from gaustar_tpu.utils.synthetic import rig_cameras

    n, rows = 23, 4
    cams = rig_cameras(n, rows=rows, dist=3.0, w=64, h=48, focal=60.0, center_z=4.0)
    assert len(cams) == n
    center = np.array([0.0, 0.0, 4.0])
    heights = set()
    for cam in cams:
        w2c = np.asarray(cam.view)
        pos = -w2c[:3, :3].T @ w2c[:3, 3]
        # on the capture sphere
        assert np.isclose(np.linalg.norm(pos - center), 3.0, atol=1e-6)
        heights.add(round(float(pos[1]), 6))
        # optical axis (camera +z) points at the center
        fwd = w2c[2, :3]
        to_center = center - pos
        to_center /= np.linalg.norm(to_center)
        np.testing.assert_allclose(fwd, to_center, atol=1e-6)
        # the center projects to the principal point
        local = w2c[:3, :3] @ center + w2c[:3, 3]
        assert abs(local[0]) < 1e-9 and abs(local[1]) < 1e-9 and local[2] > 0
    assert len(heights) == rows
