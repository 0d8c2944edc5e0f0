import numpy as np
import jax.numpy as jnp

from gaustar_tpu.io import ply
from gaustar_tpu.io.meshio import read_obj, write_obj
from gaustar_tpu.mesh.primitives import grid_mesh, icosphere
from gaustar_tpu.mesh.topology import build_topology, face_connected_components
from gaustar_tpu.models import gaussians
from gaustar_tpu.ops.knn import dist2_avg3, knn_points


def test_obj_roundtrip(tmp_path):
    verts, faces = icosphere(0)
    colors = np.random.default_rng(0).uniform(size=(len(verts), 3)).astype(np.float32)
    p = str(tmp_path / "m.obj")
    write_obj(p, verts, faces, colors)
    v2, f2, c2 = read_obj(p)
    np.testing.assert_allclose(v2, verts, atol=1e-5)
    np.testing.assert_array_equal(f2, faces)
    np.testing.assert_allclose(c2, colors, atol=1e-5)


def test_gaussian_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    n = 50
    p = gaussians.GaussianParams(
        xyz=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        features_dc=jnp.asarray(rng.normal(size=(n, 1, 3)).astype(np.float32)),
        features_rest=jnp.asarray(rng.normal(size=(n, 8, 3)).astype(np.float32)),
        scaling=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        rotation=jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        opacity=jnp.asarray(rng.normal(size=(n, 1)).astype(np.float32)),
    )
    path = str(tmp_path / "pc.ply")
    gaussians.save_ply(p, path)
    p2 = gaussians.load_ply(path)
    for f in ["xyz", "features_dc", "features_rest", "scaling", "rotation", "opacity"]:
        np.testing.assert_allclose(getattr(p2, f), getattr(p, f), atol=1e-6, err_msg=f)


def test_create_from_pcd_scales():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    colors = rng.uniform(size=(200, 3)).astype(np.float32)
    p = gaussians.create_from_pcd(pts, colors, sh_degree=2)
    assert p.features_rest.shape == (200, 8, 3)
    s = np.exp(np.asarray(p.scaling))
    assert (s > 0).all() and np.isfinite(s).all()
    # scale ~ typical nearest-neighbor distance
    from scipy.spatial import cKDTree

    d, _ = cKDTree(pts).query(pts, k=4)
    expect = np.sqrt((d[:, 1:] ** 2).mean(axis=1))
    np.testing.assert_allclose(s[:, 0], expect, rtol=1e-3)


def test_knn_points_matches_scipy():
    rng = np.random.default_rng(3)
    ref = rng.normal(size=(300, 3)).astype(np.float32)
    q = rng.normal(size=(40, 3)).astype(np.float32)
    d, idx = knn_points(jnp.asarray(q), jnp.asarray(ref), k=5)
    from scipy.spatial import cKDTree

    ds, ids = cKDTree(ref).query(q, k=5)
    np.testing.assert_allclose(np.sqrt(np.asarray(d)), ds, rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), ids)


def test_topology_grid():
    verts, faces = grid_mesh(2, 2)  # 9 verts, 8 faces
    topo = build_topology(faces, len(verts))
    # Euler: E = F*3/2 for closed; open grid: count unique edges manually
    assert len(topo.edges) == 16
    assert len(topo.boundary_edges) == 8
    labels = face_connected_components(faces, topo.adj_faces)
    assert (labels == 0).all()


def test_components_two_islands():
    verts1, faces1 = icosphere(0)
    faces2 = faces1 + len(verts1)
    faces = np.concatenate([faces1, faces2])
    labels = face_connected_components(faces)
    assert len(np.unique(labels)) == 2


def test_ply_mesh_roundtrip(tmp_path):
    verts, faces = icosphere(0)
    path = str(tmp_path / "mesh.ply")
    ply.write_ply(path, {"x": verts[:, 0], "y": verts[:, 1], "z": verts[:, 2]}, faces=faces)
    data = ply.read_ply(path)
    np.testing.assert_allclose(data["vertex"]["x"], verts[:, 0], atol=1e-6)
    np.testing.assert_array_equal(data["face"]["vertex_indices"], faces)
