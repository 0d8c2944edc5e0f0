"""Hash-grid neural field: fits a simple scene and extracts a mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from gaustar_tpu.models import neural_field as nf
from gaustar_tpu.train import init_mesh
from gaustar_tpu.utils.synthetic import ring_cameras


def test_hash_encode_shapes_and_interp():
    cfg = nf.FieldConfig(n_levels=4, table_size=1 << 10, base_res=4, max_res=32)
    p = nf.init_field(cfg)
    pts = jnp.asarray(np.random.default_rng(0).uniform(size=(100, 3)).astype(np.float32))
    enc = nf.hash_encode(p.tables, pts, cfg)
    assert enc.shape == (100, 4 * cfg.n_features)
    # continuity: nearby points -> nearby encodings
    e1 = nf.hash_encode(p.tables, pts, cfg)
    e2 = nf.hash_encode(p.tables, pts + 1e-5, cfg)
    assert float(jnp.abs(e1 - e2).max()) < 1e-3


def test_field_fits_sphere_and_extracts_mesh():
    """Train briefly on synthetic views of a white sphere; extracted mesh should
    be a blob near the sphere."""
    rng = np.random.default_rng(0)
    center = np.array([0, 0, 4.0])
    radius = 0.5
    cams = ring_cameras(6, w=48, h=48, focal=60.0)

    # Analytic gt: ray-sphere intersection -> white fg on black bg + mask.
    images, masks = [], []
    for cam in cams:
        px, py = np.meshgrid(np.arange(48) + 0.5, np.arange(48) + 0.5)
        o, d = init_mesh.rays_for_pixels(cam, jnp.asarray(px.ravel(), jnp.float32), jnp.asarray(py.ravel(), jnp.float32))
        o = np.asarray(o)
        d = np.asarray(d)
        oc = o - center
        b = (oc * d).sum(-1)
        c = (oc * oc).sum(-1) - radius**2
        hit = b * b - c > 0
        img = np.zeros((48 * 48, 3), np.float32)
        img[hit] = 1.0
        images.append(img.reshape(48, 48, 3))
        masks.append(hit.reshape(48, 48).astype(np.float32))
    images = np.stack(images)
    masks = np.stack(masks)

    fcfg = nf.FieldConfig(
        n_levels=6, table_size=1 << 14, base_res=4, max_res=64,
        aabb_min=(-1, -1, 3.0), aabb_max=(1, 1, 5.0), n_samples=64,
    )
    icfg = init_mesh.InitMeshConfig(
        iterations=150, rays_per_batch=2048, grid_res=48, iso_level=5.0,
        target_faces=5000, outlier_face_threshold=50,
    )
    params, fcfg = init_mesh.train_field(cams, images, masks, icfg, fcfg)

    # alpha along a center ray should be high, corner ray low
    cam = cams[0]
    o, d = init_mesh.rays_for_pixels(cam, jnp.asarray([24.0, 1.0]), jnp.asarray([24.0, 1.0]))
    _, alpha, depth = nf.render_rays(params, o, d, fcfg)
    assert float(alpha[0]) > 0.5, float(alpha[0])
    assert float(alpha[1]) < 0.4, float(alpha[1])

    mesh = init_mesh.extract_init_mesh(params, fcfg, icfg)
    assert len(mesh.faces) > 100
    d_center = np.linalg.norm(mesh.verts - center, axis=-1)
    assert np.median(d_center) < 0.8, np.median(d_center)


def test_field4d_composition():
    cfg = nf.FieldConfig(n_levels=3, table_size=1 << 10, base_res=4, max_res=16)
    p = nf.init_field4d(cfg, vector_res=8)
    pts = jnp.asarray(np.random.default_rng(0).uniform(size=(50, 3)).astype(np.float32))
    t0 = jnp.zeros(50)
    t1 = jnp.ones(50) * 0.7
    s0, _ = nf.query_density_4d(p, pts * 2 - 1, t0, cfg)
    s1, _ = nf.query_density_4d(p, pts * 2 - 1, t1, cfg)
    assert s0.shape == (50,)
    # time-dependence exists (different hash grids engaged via t)
    assert not np.allclose(np.asarray(s0), np.asarray(s1))


def test_adaptive_partition():
    motion = [0.1] * 10 + [2.0] + [0.1] * 5
    segs = nf.adaptive_temporal_partition(motion, budget=1.0)
    assert segs[0][0] == 0
    assert sum(e - s for s, e in segs) == len(motion)
    # the big-motion frame forces a boundary at or before it
    assert any(e == 11 for s, e in segs)
