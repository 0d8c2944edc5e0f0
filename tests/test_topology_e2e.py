"""End-to-end topology change in the default suite (CPU scale).

The two-frame new-blob scenario of examples/demo_tpu.py as a pytest: frame 0 is
a sphere, frame 1 grows a separate blob next to it. The sequence driver must
detect the change mid-refine (detect_topo_err at loose_bind_from = iters/2,
refine.py:720-737), unbind, TSDF-fuse the rendered depth, locally re-mesh
grafting the blob (refined_mesh.py:924-1062), write face_corr.npz, re-refine on
the updated mesh, and FaceTracker samples must survive the re-mesh through the
track_face_mask prefix remap (tracking_util.py:89-126).

Detection runs at the REFERENCE depth_scalar=3 (refined_mesh.py:724-726) —
possible because detect_topo_err composites residual transmittance onto the
surface (TopoDetectConfig.composite_over_surface). depth_agreement scales with
the pixel footprint: this rig is 96 px / ~25 mm-per-pixel vs the reference's
1.5 MP / mm-scale, so 5 mm would reject every vertex for purely geometric
(intra-pixel depth variation) reasons.
"""

import pytest
import dataclasses
import os

import numpy as np
import jax.numpy as jnp
from PIL import Image

from gaustar_tpu.io.meshio import read_obj, write_obj
from gaustar_tpu.mesh.primitives import icosphere
from gaustar_tpu.models import sugar
from gaustar_tpu.ops.rasterizer import RasterConfig
from gaustar_tpu.tools import mesh_render, warp_mesh
from gaustar_tpu.train import topo_detect
from gaustar_tpu.train.sequence import SequenceConfig, run_sequence
from gaustar_tpu.utils.general import inverse_sigmoid
from gaustar_tpu.utils.synthetic import ring_cameras

pytestmark = pytest.mark.slow  # full-budget e2e tier (README: Tests)

W = H = 96
FOCAL = 120.0
N_CAMS = 8
ITERS = 40
RCFG = RasterConfig(max_pairs=1 << 15, chunk=32, max_per_tile=512, impl="jax")
# Touching the sphere (like the reference's cloth-pickup scenario): unbound
# gaussians only need to migrate outward from the adjacent surface, feasible in
# the ITERS/2 post-unbind budget with the boosted test learning rate.
BLOB_CENTER = np.array([0.58, 0.08, 4.0])
SPHERE_CENTER = np.array([0.0, 0.0, 4.0])


def _build_dataset(root):
    os.makedirs(root, exist_ok=True)
    cams = ring_cameras(N_CAMS, w=W, h=H, focal=FOCAL)
    intr = np.stack([np.diag([FOCAL, FOCAL, 1.0])] * N_CAMS)
    extr = np.stack([np.asarray(c.view) for c in cams])
    shape = np.stack([[H, W]] * N_CAMS)
    np.savez(os.path.join(root, "rgb_cameras.npz"), intrinsics=intr, extrinsics=extr, shape=shape)

    rng = np.random.default_rng(0)
    v1, f1 = icosphere(2, radius=0.5, center=(0, 0, 4.0))
    c1 = rng.uniform(0.2, 0.9, size=(len(v1), 3)).astype(np.float32)
    v2, f2 = icosphere(1, radius=0.22, center=tuple(BLOB_CENTER))
    c2 = rng.uniform(0.2, 0.9, size=(len(v2), 3)).astype(np.float32)
    scenes = [
        (v1, f1, c1),
        (np.concatenate([v1, v2]), np.concatenate([f1, f2 + len(v1)]), np.concatenate([c1, c2])),
    ]

    for fi, (verts, faces, colors) in enumerate(scenes):
        params, config = sugar.init_sugar(verts, faces, vertex_colors=colors)
        params = dataclasses.replace(
            params, densities=jnp.full_like(params.densities, inverse_sigmoid(0.99))
        )
        fdir = os.path.join(root, f"{fi:04d}")
        for sub in ["images", "masks_humanrf", "depth_humanrf", "flow_bi"]:
            os.makedirs(os.path.join(fdir, sub), exist_ok=True)
        for ci, cam in enumerate(cams):
            img, aux = sugar.render(params, config, cam, bg=(0, 0, 0), raster_config=RCFG)
            alpha = 1.0 - np.asarray(aux.final_T)
            Image.fromarray((np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(fdir, "images", f"img_{ci:04d}.jpg"), quality=97
            )
            Image.fromarray(((alpha > 0.5) * 255).astype(np.uint8)).save(
                os.path.join(fdir, "masks_humanrf", f"img_{ci:04d}_alpha.png")
            )
            # GT depth from the mesh z-buffer — the reference's depth_humanrf is
            # rendered from actual meshes (render_depth_from_mesh.py:13-101,
            # invalid = 999), NOT alpha-blended splats: blended depth carries a
            # +T*bg residual (~cm here) that is not in real captures.
            d, valid, _ = mesh_render.render_mesh_depth(verts, faces, cam)
            d = np.asarray(d)
            np.savez(
                os.path.join(fdir, "depth_humanrf", f"img_{ci:04d}_depth.npz"),
                depth=np.where(np.asarray(valid) > 0.5, d, 999.0),
            )
        if fi == 0:  # new object, not motion: zero flow
            for ci in range(N_CAMS):
                z = np.zeros((H // 2, W // 2, 2), np.float32)
                np.savez(os.path.join(fdir, "flow_bi", f"{ci:04d}_f.npz"), flow=z)
                np.savez(os.path.join(fdir, "flow_bi", f"{ci:04d}_b.npz"), flow=z)
    write_obj(os.path.join(root, "init_mesh_100k.obj"), v1, f1, c1)
    return len(f1)


def test_topology_change_end_to_end(tmp_path):
    root = str(tmp_path / "data")
    work = str(tmp_path / "work")
    n_faces_0 = _build_dataset(root)

    seq = SequenceConfig(
        data_root=root, work_root=work, frame_0=0, frame_end=2,
        refinement_iterations=ITERS, sh_reg=True,
        force_watertight=False, boundary_pad=0.1,
        update_cc_face_threshold=10, unbind_threshold=30,
        fusion_voxel_size=0.03, fusion_simplify_face_num=2000,
        spatial_lr_scale=20.0,  # ~65x the reference formula; see SequenceConfig
        fusion_solid_opacity=0.995,
        # Small bucket: the topology-change path (unbind -> fusion -> surgery
        # -> re-refine) runs END TO END in compile-reuse mode, proving the
        # padded model round-trips through every stage.
        face_bucket=256,
    )
    dcfg = topo_detect.TopoDetectConfig(
        depth_scalar=3.0,  # the REFERENCE constant (refined_mesh.py:724-726)
        min_observe=3, mesh_prop=10, detect_floor=False,
        depth_agreement=0.05,  # scaled to the ~25 mm/px footprint (see module doc)
        edge_threshold=0.6, edge_scalar=100.0, voxel_size=0.05,
    )
    wcfg = warp_mesh.WarpConfig(
        min_observe=2, depth_agreement=0.02, edge_threshold=0.5,
        depth_edge_ker_size=3, edge_scalar=1000.0, max_move_dist=0.05,
    )
    run_sequence(seq, raster_cfg=RCFG, detect_cfg=dcfg, warp_cfg=wcfg)

    # Frame 0: no topology change — no update artifacts.
    assert not os.path.exists(os.path.join(work, "0000", "updated_mesh.obj"))
    assert os.path.exists(os.path.join(work, "0000", "color_mesh.obj"))

    # Frame 1: the blob must trigger unbind -> fuse -> re-mesh (cc_update >= 1).
    f1dir = os.path.join(work, "0001")
    assert os.path.exists(os.path.join(f1dir, "updated_mesh.obj")), (
        "topology change was not detected/grafted"
    )
    corr = np.load(os.path.join(f1dir, "face_corr.npz"))
    track = corr["track_face_mask"]
    new_ref_area = corr["ref_area"]

    uv, uf, _ = read_obj(os.path.join(f1dir, "updated_mesh.obj"))
    # track_face_mask indexes the OLD (warped frame-0) mesh; tracked faces form
    # the PREFIX of the updated mesh (refined_mesh.py:656-664 invariant).
    assert track.shape[0] == n_faces_0
    n_tracked = int(track.sum())
    assert 0 < n_tracked <= n_faces_0
    assert len(uf) > n_tracked  # grafted new faces after the tracked prefix
    assert new_ref_area.shape[0] == len(uf)

    # The graft must extend the surface toward the blob: some updated-mesh
    # geometry protrudes beyond the sphere radius in the blob direction.
    blob_dir = (BLOB_CENTER - SPHERE_CENTER) / np.linalg.norm(BLOB_CENTER - SPHERE_CENTER)
    protrusion = ((uv - SPHERE_CENTER) @ blob_dir).max()
    assert protrusion > 0.52, f"graft does not extend toward the blob ({protrusion:.3f})"
    # ...and the tracked prefix must still be sphere surface: verts of tracked
    # faces sit near radius 0.5 of the sphere center.
    tv = uv[uf[:n_tracked].reshape(-1)]
    r = np.linalg.norm(tv - SPHERE_CENTER, axis=1)
    assert np.median(np.abs(r - 0.5)) < 0.1

    # FaceTracker samples survive the re-mesh via the prefix remap.
    ov, of_, _ = read_obj(os.path.join(f1dir, "coarse_mesh", "warp_smooth.obj"))
    tracker = warp_mesh.FaceTracker.sample(n_faces_0, start=5, step=40)
    pos_before = tracker.positions(ov, of_)
    tracker.remap_after_update(pos_before, track.astype(bool), uv, uf)
    pos_after = tracker.positions(uv, uf)
    assert (tracker.face_ids < len(uf)).all()
    # Remapped samples stay close to where they were (surface is unchanged for
    # tracked faces; snapped ones move at most a couple of edge lengths).
    move = np.linalg.norm(pos_after - pos_before, axis=1)
    assert np.median(move) < 0.05, move

    # Frame-1 render must reproduce the blob: PSNR against GT cam 0 recovers.
    from gaustar_tpu.eval.metrics import psnr
    from gaustar_tpu.io import checkpoint as ck
    from gaustar_tpu.io import dataset as dsio

    params, config, _ = ck.load_sugar(os.path.join(f1dir, f"{ITERS}.npz"))
    assert config.faces.shape[0] == len(uf)  # re-refine ran on the updated mesh
    cmr = dsio.load_rgb_cameras(os.path.join(root, "rgb_cameras.npz"))
    cams = dsio.cameras_from_npz(cmr)
    gt_images, _ = dsio.load_frame_images(root, 1, len(cams))
    img, _ = sugar.render(params, config, cams[0], bg=(0, 1, 0), raster_config=RCFG)
    p = float(psnr(jnp.clip(img, 0, 1), jnp.asarray(gt_images[0])))
    assert p > 15.5, f"frame-1 PSNR {p:.2f} did not recover after mesh update"  # 16.5 typ. at this budget
