"""Flow-guided warp + face tracking."""

import numpy as np

from gaustar_tpu.mesh.primitives import grid_mesh, icosphere
from gaustar_tpu.mesh.topology import build_topology
from gaustar_tpu.tools import warp_mesh
from gaustar_tpu.tools.warp_mesh import FaceTracker, WarpConfig, barycentric_coords


def _plane_scene(n_cams=5, w=64, h=64, fx=80.0, dx=0.05):
    """Plane at z=4 translated by dx in world x between frames; analytic flow."""
    verts, faces = grid_mesh(8, 8, scale=1.5, z=4.0)
    # Ensure normals face the camera at origin (-z in camera frame).
    fv = verts[faces]
    n = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    if n[:, 2].mean() > 0:
        faces = faces[:, ::-1].copy()

    cams = {"intrinsics": [], "extrinsics": [], "shape": []}
    flows_f, flows_b, d_cur, d_next = [], [], [], []
    rng = np.random.default_rng(0)
    for ci in range(n_cams):
        # slight camera offsets, all looking down +z
        off = np.array([rng.uniform(-0.2, 0.2), rng.uniform(-0.2, 0.2), 0.0])
        extr = np.eye(4)
        extr[:3, 3] = -off  # w2c: local = p - off
        intr = np.array([[fx, 0, 0], [0, fx, 0], [0, 0, 1.0]])
        cams["intrinsics"].append(intr)
        cams["extrinsics"].append(extr)
        cams["shape"].append((h, w))
        # plane at depth 4 fills the fov (extent 1.5 at fov ~ +-0.4*4=1.6)
        d_cur.append(np.full((h, w), 4.0, np.float32))
        d_next.append(np.full((h, w), 4.0, np.float32))
        # pixel shift for world dx at z=4: col shift = fx*dx/z; flow is (row, col)
        shift = fx * dx / 4.0
        f = np.zeros((h, w, 2), np.float32)
        f[..., 1] = shift
        flows_f.append(f)
        flows_b.append(-f)
    for k in cams:
        cams[k] = np.asarray(cams[k])
    return verts, faces, cams, flows_f, flows_b, d_cur, d_next, dx


def test_warp_recovers_translation():
    verts, faces, cams, ff, fb, dc, dn, dx = _plane_scene()
    cfg = WarpConfig(min_observe=2, depth_agreement=0.01)
    warped, move, observed = warp_mesh.warp_mesh_using_flow(
        verts.astype(np.float64), faces, cams, ff, fb, dc, dn, cfg
    )
    assert observed.sum() > len(verts) * 0.5
    err = np.abs(move[observed] - np.array([dx, 0, 0]))
    assert err.max() < 0.02, err.max()
    # propagation + smoothing keeps unobserved verts near the same translation
    assert np.abs(move - np.array([dx, 0, 0])).max() < 0.05


def test_warp_rejects_bad_bidirectional():
    verts, faces, cams, ff, fb, dc, dn, dx = _plane_scene()
    # corrupt backward flow of every camera -> nothing visible -> zero motion
    fb = [b * 0.0 + 30.0 for b in fb]
    cfg = WarpConfig(min_observe=2, depth_agreement=0.01)
    warped, move, observed = warp_mesh.warp_mesh_using_flow(
        verts.astype(np.float64), faces, cams, ff, fb, dc, dn, cfg
    )
    assert observed.sum() == 0
    np.testing.assert_allclose(move, 0.0)


def test_barycentric_roundtrip():
    rng = np.random.default_rng(1)
    tri = rng.normal(size=(10, 3, 3))
    bary = rng.dirichlet((1, 1, 1), size=10)
    pts = (tri * bary[..., None]).sum(axis=1)
    back = barycentric_coords(tri, pts)
    np.testing.assert_allclose(back, bary, atol=1e-6)


def test_tracker_through_update():
    verts, faces = icosphere(2, radius=1.0)
    tracker = FaceTracker.sample(len(faces), start=2, step=20)
    pos0 = tracker.positions(verts, faces)

    # Fake re-mesh: drop the 30 faces nearest the north pole, append 30 new ones
    # (a translated copy of the dropped region's geometry).
    centers = verts[faces].mean(axis=1)
    drop = np.argsort(-centers[:, 1])[:30]
    track_face_mask = np.ones(len(faces), dtype=bool)
    track_face_mask[drop] = False
    new_faces = np.concatenate([faces[track_face_mask], faces[drop]])
    new_verts = verts.copy()

    tracker.remap_after_update(pos0, track_face_mask, new_verts, new_faces)
    pos1 = tracker.positions(new_verts, new_faces)
    # All sample positions must be preserved through the remap.
    np.testing.assert_allclose(pos1, pos0, atol=1e-5)
