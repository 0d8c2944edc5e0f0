"""ICP + SuGaR scene editing."""

import numpy as np
import jax.numpy as jnp

from gaustar_tpu.models import sugar
from gaustar_tpu.tools import registration as reg
from gaustar_tpu.utils.synthetic import synthetic_frame


def test_best_fit_transform_exact():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(50, 3))
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = np.array([0.3, -0.2, 0.7])
    B = A @ q.T + t
    T, R, tt = reg.best_fit_transform(A, B)
    np.testing.assert_allclose(R, q, atol=1e-8)
    np.testing.assert_allclose(tt, t, atol=1e-8)


def test_icp_recovers_small_transform():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(500, 3))
    angle = 0.1
    R = np.array([
        [np.cos(angle), -np.sin(angle), 0],
        [np.sin(angle), np.cos(angle), 0],
        [0, 0, 1.0],
    ])
    dst = pts @ R.T + np.array([0.05, 0.02, -0.03])
    T, hist = reg.icp(pts, dst)
    moved = pts @ T[:3, :3].T + T[:3, 3]
    assert np.abs(moved - dst).max() < 1e-3
    assert hist[-1] < 1e-4


def test_cut_and_transform_model():
    params, config, data, target, rcfg = synthetic_frame(n_cams=1)
    n_faces = config.faces.shape[0]
    # cut: keep upper hemisphere faces
    bb = np.array([[-10, -10, -10], [10, 0.0, 10]])
    p2, c2 = reg.cut_model_by_box(target, config, bb, keep_inside=True)
    assert 0 < c2.faces.shape[0] < n_faces
    assert p2.scales.shape[0] == c2.faces.shape[0] * 6
    # valid face indexing
    assert int(jnp.max(c2.faces)) < p2.points.shape[0]
    # transform: translation moves centers
    T = np.eye(4); T[:3, 3] = [1.0, 0, 0]
    p3 = reg.transform_model(p2, c2, T)
    d = np.asarray(sugar.gaussian_centers(p3, c2)) - np.asarray(sugar.gaussian_centers(p2, c2))
    np.testing.assert_allclose(d, np.broadcast_to([1.0, 0, 0], d.shape), atol=1e-5)


def test_recolor():
    params, config, data, target, rcfg = synthetic_frame(n_cams=1)
    p2 = reg.recolor_model(target, factor=(0.0, 0.0, 0.0), offset=(1.0, 0.0, 0.0))
    from gaustar_tpu.ops.sh import sh_to_rgb_dc
    rgb = np.asarray(sh_to_rgb_dc(p2.sh_dc))
    np.testing.assert_allclose(rgb[..., 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(rgb[..., 1], 0.0, atol=1e-5)
