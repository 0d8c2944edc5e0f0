"""The reference's default-off knobs: laplacian smoothing, area_reg, eval
split, border-face postprocess (VERDICT round-1 "missing #7")."""

import jax
import jax.numpy as jnp
import numpy as np

from gaustar_tpu.io.dataset import split_eval_cameras
from gaustar_tpu.mesh.primitives import uv_sphere
from gaustar_tpu.mesh.topology import build_topology
from gaustar_tpu.models import sugar
from gaustar_tpu.ops import losses
from gaustar_tpu.train.mesh_update import postprocess_border_faces, subset_sugar_faces


def _sphere_scene(nlat=7, nlon=10):
    verts, faces = uv_sphere(nlat, nlon, radius=0.5, center=(0.0, 0.0, 3.0))
    params, config = sugar.init_sugar(verts, faces)
    return verts, faces, params, config


def test_laplacian_smoothing_loss():
    verts, faces, *_ = _sphere_scene()
    topo = build_topology(np.asarray(faces), len(verts))
    v = jnp.asarray(verts)
    base = losses.mesh_laplacian_smoothing_loss(v, jnp.asarray(topo.edges))
    assert float(base) > 0.0  # a sphere has curvature
    # Perturbing one vertex raises the loss; the gradient pulls it back.
    v2 = v.at[5].add(jnp.asarray([0.0, 0.0, 0.3]))
    worse = losses.mesh_laplacian_smoothing_loss(v2, jnp.asarray(topo.edges))
    assert float(worse) > float(base)
    g = jax.grad(losses.mesh_laplacian_smoothing_loss)(v2, jnp.asarray(topo.edges))
    assert float(g[5, 2]) > 0.0  # gradient points along the perturbation


def test_area_reg_loss():
    verts, faces, *_ = _sphere_scene()
    v = jnp.asarray(verts)
    f = jnp.asarray(faces)
    # Near-uniform sphere triangulation: no face below half the mean -> ~0.
    base = losses.mesh_area_reg_loss(v, f)
    # Collapse one face to a sliver: relu(mean/area - 2) turns on.
    v2 = v.at[faces[0, 1]].set(v[faces[0, 0]] + 1e-4)
    shrunk = losses.mesh_area_reg_loss(v2, f)
    assert float(shrunk) > float(base)
    assert float(shrunk) > 0.0


def test_eval_split_every_8th():
    items = list(range(40))
    train, test = split_eval_cameras(items)
    # gs_model.py:119-131: i % 8 == 0 goes to the TEST set.
    assert test == [0, 8, 16, 24, 32]
    assert len(train) == 35 and 0 not in train
    tr2, te2 = split_eval_cameras(items, eval_split=False)
    assert tr2 == items and te2 == []


def test_compute_density_peaks_on_surface():
    _, _, params, config = _sphere_scene()
    centers = sugar.gaussian_centers(params, config)
    on = sugar.compute_density(params, config, centers[:8], k=8)
    off = sugar.compute_density(
        params, config, centers[:8] + jnp.asarray([0.0, 0.0, 1.0]), k=8
    )
    assert float(jnp.min(on)) > float(jnp.max(off))
    assert float(jnp.min(on)) > 0.09  # >= own strength (init 0.1) modulo clamp


def test_postprocess_border_faces_closed_mesh_keeps_all():
    _, faces, params, config = _sphere_scene()
    (p2, c2), mask = postprocess_border_faces(params, config)
    assert mask.all()  # closed mesh: no border faces
    assert c2.faces.shape == config.faces.shape


def test_postprocess_border_faces_peels_open_fan():
    verts, faces, params, config = _sphere_scene()
    # Cut away half the sphere -> a large boundary ring appears; with a huge
    # density threshold nothing is re-added, so 5 peel iterations remove 5
    # rings of border faces.
    keep = np.arange(len(faces)) < (len(faces) // 2)
    (p1, c1) = subset_sugar_faces(params, config, keep)
    (p2, c2), mask = postprocess_border_faces(p1, c1, density_threshold=1e9, iterations=2)
    assert mask.sum() < keep.sum()  # some faces peeled
    assert c2.faces.shape[0] == int(mask.sum())
    ng = c1.n_gaussians_per_face
    assert p2.scales.shape[0] == int(mask.sum()) * ng
    # Re-adding by density: with threshold 0 every peeled face comes back.
    (_, c3), mask3 = postprocess_border_faces(p1, c1, density_threshold=0.0, iterations=2)
    assert mask3.all()


def test_refine_knobs_compile_and_run():
    from gaustar_tpu.cameras import stack_cameras
    from gaustar_tpu.ops.rasterizer import RasterConfig
    from gaustar_tpu.train.refine import FrameData, RefineConfig, compute_losses, compute_margins
    from gaustar_tpu.utils.synthetic import ring_cameras

    verts, faces, params, config = _sphere_scene()
    cams = ring_cameras(2, w=48, h=32, focal=45.0)
    batch = stack_cameras(cams)
    topo = build_topology(np.asarray(faces), len(verts))
    ref_edge = losses.edge_lengths(jnp.asarray(verts), jnp.asarray(topo.edges))
    ref_area, _ = losses.face_areas_normals(jnp.asarray(verts), jnp.asarray(faces))
    margins = compute_margins(np.asarray(batch.cx), np.asarray(batch.cy), 48, 32)
    data = FrameData(
        cameras=batch,
        gt_images=jnp.zeros((2, 32, 48, 3)),
        gt_depths=jnp.full((2, 32, 48), 10.5),
        margins=jnp.asarray(margins),
        ref_edge_len=ref_edge,
        ref_area=ref_area,
        edges=jnp.asarray(topo.edges),
        adj_faces=jnp.asarray(topo.adj_faces),
    )
    cfg = RefineConfig(
        num_iterations=10,
        use_laplacian_smoothing=True,
        area_reg_from=0,
        do_sh_warmup=False,
    )
    rc = RasterConfig(max_pairs=1 << 13, chunk=8, impl="jax")
    loss, ld = compute_losses(params, config, data, 0, 5, cfg, rc, 2)
    assert np.isfinite(float(loss))
    assert "laplacian_loss" in ld and np.isfinite(float(ld["laplacian_loss"]))
    assert "area_reg_loss" in ld and np.isfinite(float(ld["area_reg_loss"]))
