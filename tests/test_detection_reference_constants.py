"""Topology detection with the REFERENCE constants at 256 px (VERDICT r2 item 6,
rebuilt r5 per VERDICT r4 item 1).

The default e2e suite runs detection at thresholds scaled to its 96 px rig
(tests/test_topology_e2e.py); this test CI-proves that the reference's own
constants — depth_scalar=3 (refined_mesh.py:724-726) and the 5 mm
depth_agreement floor (refined_mesh.py:796-804) — detect a real topology change
at a 256 px / ~12 mm-per-pixel rig. The r4 version failed in two compounding
ways (diagnosed r5 with an exact-geometry probe):
  1. FIXED 5 mm gate at a 12 mm/px rig — below one pixel footprint of depth, so
     the visibility gate sat on a numeric cliff and on some machines silently
     rejected every vertex (all-zero detection).
  2. A mesh 10x COARSER than the pixel grid (icosphere-2: 131 mm edges) — the
     rendered depth is blended from per-gaussian CENTER depths at fixed face
     barycenters, so its discrepancy vs GT is O(edge x slope) ~ 70 mm even at
     the exact GT geometry, which saturates the reference's 20 mm flag scale
     (loss*depth_scalar >= 0.6 <=> |gt-render| >= 20 mm) and flags everything.
     The reference NEVER operates there: its 100k-face mesh has ~5 mm edges ~
     2 pixel footprints.
The production fix is observability + a scale-aware gate (topo_detect.py):
`agreement_px`/`agreement_edge` widen the gate to >= 2 pixel footprints and
>= 1 mean edge length (both == 5 mm in the reference's own regime), and
`DetectTelemetry` makes a collapsed gate loud instead of silent. This test now
runs at the REPRESENTATIVE mesh resolution (icosphere-5: 16 mm edges ~ 1.3
pixel footprints, the reference's edge-to-footprint ratio) and asserts
detection AND healthy coverage with margin; the fast test below pins the
collapsed-gate failure mode itself.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from gaustar_tpu.cameras import index_camera, stack_cameras
from gaustar_tpu.mesh.primitives import icosphere
from gaustar_tpu.mesh.topology import build_topology
from gaustar_tpu.models import sugar
from gaustar_tpu.ops.losses import edge_lengths, face_areas_normals
from gaustar_tpu.ops.rasterizer import RasterConfig
from gaustar_tpu.tools import mesh_render
from gaustar_tpu.train import refine, topo_detect
from gaustar_tpu.utils.general import inverse_sigmoid
from gaustar_tpu.utils.synthetic import ring_cameras

W = H = 256
FOCAL = 320.0
N_CAMS = 8
RCFG = RasterConfig(max_pairs=1 << 20, max_padded=1 << 21, chunk=32, max_per_tile=4096, impl="jax")
BLOB_CENTER = np.array([0.58, 0.08, 4.0])


@pytest.mark.slow
def test_reference_constants_detect_new_blob_at_256px():
    rng = np.random.default_rng(0)
    # icosphere(5): 20480 faces, ~16 mm edges at r=0.5 — the reference's
    # edge-to-pixel-footprint ratio at this 12 mm/px rig (see module docstring).
    v1, f1 = icosphere(5, radius=0.5, center=(0, 0, 4.0))
    c1 = rng.uniform(0.2, 0.9, size=(len(v1), 3)).astype(np.float32)
    v2, f2 = icosphere(3, radius=0.22, center=tuple(BLOB_CENTER))
    # Frame-1 GT: sphere + NEW blob (the cloth-pickup scenario).
    verts_gt = np.concatenate([v1, v2])
    faces_gt = np.concatenate([f1, f2 + len(v1)])

    cams = stack_cameras(ring_cameras(N_CAMS, w=W, h=H, focal=FOCAL))
    gt_images, gt_depths = [], []
    gt_params, gt_config = sugar.init_sugar(
        verts_gt, faces_gt,
        vertex_colors=rng.uniform(0.2, 0.9, size=(len(verts_gt), 3)).astype(np.float32),
    )
    gt_params = dataclasses.replace(
        gt_params, densities=jnp.full_like(gt_params.densities, inverse_sigmoid(0.99))
    )
    for ci in range(N_CAMS):
        cam = index_camera(cams, ci)
        img, _ = sugar.render(gt_params, gt_config, cam, bg=(0, 1, 0), raster_config=RCFG)
        gt_images.append(np.asarray(img))
        # GT depth from the mesh z-buffer (like the dataset's depth_humanrf).
        d, valid, _ = mesh_render.render_mesh_depth(verts_gt, faces_gt, cam)
        gt_depths.append(np.where(np.asarray(valid) > 0.5, np.asarray(d), 999.0))
    gt_images = np.stack(gt_images).astype(np.float32)
    gt_depths = np.minimum(np.stack(gt_depths), 10.5).astype(np.float32)

    # Model bound to the OLD (sphere-only) mesh, briefly refined against the
    # new GT — the mid-refine state detection sees at loose_bind_from.
    topo = build_topology(f1, len(v1))
    el = np.asarray(edge_lengths(jnp.asarray(v1), jnp.asarray(topo.edges)))
    area, _ = face_areas_normals(jnp.asarray(v1), jnp.asarray(f1))
    params, config = sugar.init_sugar(
        v1, f1, vertex_colors=c1,
        min_scale=float(el.mean()) * 0.1, max_scale=float(el.mean()) * 5.0,
    )
    margins = refine.compute_margins(np.asarray(cams.cx), np.asarray(cams.cy), W, H)
    data = refine.FrameData(
        cameras=cams, gt_images=jnp.asarray(gt_images), gt_depths=jnp.asarray(gt_depths),
        margins=jnp.asarray(margins), ref_edge_len=jnp.asarray(el),
        ref_area=jnp.asarray(np.asarray(area)), edges=jnp.asarray(topo.edges),
        adj_faces=jnp.asarray(topo.adj_faces),
    )
    cfg = refine.RefineConfig(num_iterations=16, loose_bind_from=10**9, do_sh_warmup=False)
    params, config, _ = refine.refine_frame(params, config, data, cfg, RCFG)

    # Detection with the REFERENCE constants (only the rig/scale-bound knobs
    # adapted: edge normalization, voxel pooling, and the OBSERVATION stats —
    # a ring-of-8 rig around a SPHERE has a far higher grazing-slope fraction
    # than 160 ActorsHQ cameras around a mostly-frontal human, and the blended
    # depth error grows with slope (see module docstring), so the gate gets 4
    # pixel footprints instead of 2 and min_observe 2/8 — still stricter
    # proportionally than the reference's 4/160).
    dcfg = topo_detect.TopoDetectConfig(
        depth_scalar=3.0,        # refined_mesh.py:724-726
        depth_agreement=0.005,   # refined_mesh.py:796-804 (5 mm floor)
        agreement_px=4.0,
        min_observe=2, mesh_prop=10, detect_floor=False,
        edge_threshold=0.6, edge_scalar=200.0, voxel_size=0.05,
    )
    fw = topo_detect.detect_topo_err(
        params, config, cams, gt_depths, topo, RCFG, dcfg
    )

    # The gate must not have collapsed (the r4 failure mode): most vertices
    # observed, with margin — not sitting at a numeric cliff.
    tel = topo_detect.last_telemetry
    assert tel is not None and tel.healthy
    assert tel.observed_fraction > 0.5, f"observed {tel.observed_fraction:.1%}"
    assert tel.coverage_per_cam.mean() > 0.2, f"coverage {tel.coverage_per_cam.mean():.1%}"

    # Faces near the blob must be flagged; faces on the far side must not.
    centers = v1[f1].mean(axis=1)
    near_blob = np.linalg.norm(centers - BLOB_CENTER, axis=1) < 0.3
    far_side = centers[:, 0] < -0.25
    assert fw[near_blob].max() >= 0.6, f"blob region not flagged (max {fw[near_blob].max():.3f})"
    flagged_far = (fw[far_side] >= 0.6).mean()
    assert flagged_far < 0.05, f"{flagged_far:.1%} of far-side faces falsely flagged"


def test_collapsed_visibility_gate_warns():
    """A gate far below the rig's pixel footprint (the r4 silent-all-zero
    failure) must produce telemetry with ~0 coverage AND a RuntimeWarning —
    never a silent 'no topology change'. Uses a pathologically tiny fixed gate
    (agreement_px=0 disables the resolution-aware widening) so the collapse is
    deterministic on every machine."""
    import warnings as _warnings

    rng = np.random.default_rng(1)
    v, f = icosphere(1, radius=0.5, center=(0, 0, 4.0))
    params, config = sugar.init_sugar(
        v, f, vertex_colors=rng.uniform(0.2, 0.9, size=(len(v), 3)).astype(np.float32)
    )
    cams = stack_cameras(ring_cameras(4, w=64, h=64, focal=80.0))
    gt_depths = np.full((4, 64, 64), 4.0, np.float32)
    topo = build_topology(f, len(v))
    rcfg = RasterConfig(max_pairs=1 << 14, max_padded=1 << 15, chunk=32,
                        max_per_tile=512, impl="jax")
    dcfg = dataclasses.replace(
        topo_detect.TopoDetectConfig(), depth_agreement=1e-9, agreement_px=0.0,
        min_observe=2, mesh_prop=0, detect_floor=False,
    )
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        fw = topo_detect.detect_topo_err(params, config, cams, gt_depths, topo, rcfg, dcfg)
    tel = topo_detect.last_telemetry
    assert tel is not None and not tel.healthy
    assert np.all(fw == 0.0)
    assert any(issubclass(w.category, RuntimeWarning)
               and "coverage collapsed" in str(w.message) for w in rec)
