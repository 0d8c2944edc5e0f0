"""Topology detection with the REFERENCE constants at 256 px (VERDICT r2 item 6).

The default e2e suite runs detection at thresholds scaled to its 96 px rig
(tests/test_topology_e2e.py); this test CI-proves that the reference's own
constants — depth_scalar=3 (refined_mesh.py:724-726) and the 5 mm
depth_agreement (refined_mesh.py:796-804) — detect a real topology change at a
256 px / ~12 mm-per-pixel rig, the configuration examples/demo_tpu.py:148 runs
manually. Slow-marked (a short refine at 256 px must converge first).
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
RCFG = RasterConfig(max_pairs=1 << 17, max_padded=1 << 18, chunk=32, max_per_tile=1024, impl="jax")
BLOB_CENTER = np.array([0.58, 0.08, 4.0])


@pytest.mark.slow
def test_reference_constants_detect_new_blob_at_256px():
    rng = np.random.default_rng(0)
    v1, f1 = icosphere(2, radius=0.5, center=(0, 0, 4.0))
    c1 = rng.uniform(0.2, 0.9, size=(len(v1), 3)).astype(np.float32)
    v2, f2 = icosphere(1, radius=0.22, center=tuple(BLOB_CENTER))
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
    cfg = refine.RefineConfig(num_iterations=40, loose_bind_from=10**9, do_sh_warmup=False)
    params, config, _ = refine.refine_frame(params, config, data, cfg, RCFG)

    # Detection with the REFERENCE constants (only the resolution/scale-bound
    # knobs adapted: edge normalization, voxel pooling, rig-size min_observe).
    dcfg = topo_detect.TopoDetectConfig(
        depth_scalar=3.0,        # refined_mesh.py:724-726
        depth_agreement=0.005,   # refined_mesh.py:796-804 (5 mm)
        min_observe=3, mesh_prop=10, detect_floor=False,
        edge_threshold=0.6, edge_scalar=200.0, voxel_size=0.05,
    )
    fw = topo_detect.detect_topo_err(
        params, config, cams, gt_depths, topo, RCFG, dcfg
    )

    # Faces near the blob must be flagged; faces on the far side must not.
    centers = v1[f1].mean(axis=1)
    near_blob = np.linalg.norm(centers - BLOB_CENTER, axis=1) < 0.3
    far_side = centers[:, 0] < -0.25
    assert fw[near_blob].max() >= 0.6, f"blob region not flagged (max {fw[near_blob].max():.3f})"
    flagged_far = (fw[far_side] >= 0.6).mean()
    assert flagged_far < 0.05, f"{flagged_far:.1%} of far-side faces falsely flagged"
