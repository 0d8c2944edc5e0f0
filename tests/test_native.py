"""Native C++ mesh kernels (with build-on-import)."""

import numpy as np

from gaustar_tpu import native
from gaustar_tpu.mesh.primitives import icosphere
from gaustar_tpu.mesh.topology import build_topology


def test_native_built():
    assert native.HAVE_NATIVE, "libmeshops.so should build in this environment"


def test_decimate_sphere():
    verts, faces = icosphere(4, radius=1.0)  # 5120 faces
    v2, f2 = native.decimate(verts, faces, target_faces=600)
    assert len(f2) <= 900, len(f2)
    assert len(f2) >= 300
    # still a sphere: radius preserved
    rr = np.linalg.norm(v2, axis=-1)
    assert abs(np.median(rr) - 1.0) < 0.05
    # still closed (quadric collapse on a closed sphere keeps it watertight)
    topo = build_topology(f2, len(v2))
    assert len(topo.boundary_edges) == 0
    # volume close to sphere volume
    sv = np.einsum("ij,ij->i", v2[f2[:, 0]], np.cross(v2[f2[:, 1]], v2[f2[:, 2]])).sum() / 6
    assert abs(abs(sv) - 4 / 3 * np.pi) < 0.7


def test_laplacian_smooth_shrinks_noise():
    rng = np.random.default_rng(0)
    verts, faces = icosphere(3, radius=1.0)
    noisy = verts + rng.normal(scale=0.02, size=verts.shape)
    sm = native.laplacian_smooth(noisy, faces, iterations=10, lam=0.5)
    rr_noisy = np.linalg.norm(noisy, axis=-1)
    rr_sm = np.linalg.norm(sm, axis=-1)
    assert rr_sm.std() < rr_noisy.std() * 0.5


def test_knn3_matches_scipy():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(2000, 3)).astype(np.float32)
    out = native.knn3_mean_sq_dist(pts, prefer_native=True)
    from scipy.spatial import cKDTree

    d, _ = cKDTree(pts).query(pts, k=4)
    want = (d[:, 1:] ** 2).mean(axis=1)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-6)


def test_face_components_native():
    v1, f1 = icosphere(1)
    faces = np.concatenate([f1, f1 + len(v1)])
    labels = native.face_components(faces, 2 * len(v1))
    assert len(np.unique(labels)) == 2
    assert (labels[: len(f1)] == labels[0]).all()
