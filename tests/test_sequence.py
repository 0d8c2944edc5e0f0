"""End-to-end sequence driver on a tiny on-disk synthetic dataset."""

import pytest
import os

import numpy as np
import jax.numpy as jnp
from PIL import Image

from gaustar_tpu.io.meshio import write_obj, read_obj
from gaustar_tpu.mesh.primitives import icosphere
from gaustar_tpu.models import sugar
from gaustar_tpu.ops.rasterizer import RasterConfig
from gaustar_tpu.train.sequence import SequenceConfig, run_sequence
from gaustar_tpu.utils.general import inverse_sigmoid
from gaustar_tpu.utils.synthetic import ring_cameras
from gaustar_tpu.train import topo_detect
from gaustar_tpu.tools import warp_mesh


pytestmark = pytest.mark.slow  # full-budget e2e tier (README: Tests)

def _build_dataset(root, n_cams=8, w=96, h=96, dx=0.03):
    """Two frames: a colored sphere, translated by dx in x between frames."""
    import dataclasses

    os.makedirs(root, exist_ok=True)
    cams = ring_cameras(n_cams, w=w, h=h, focal=120.0)
    intr = np.stack([np.diag([120.0, 120.0, 1.0]) for _ in cams])
    extr = np.stack([np.asarray(c.view) for c in cams])
    shape = np.stack([[h, w]] * n_cams)
    np.savez(os.path.join(root, "rgb_cameras.npz"), intrinsics=intr, extrinsics=extr, shape=shape)

    rcfg = RasterConfig(max_pairs=1 << 15, chunk=32, max_per_tile=512, impl="jax")
    rng = np.random.default_rng(0)
    verts0, faces = icosphere(2, radius=0.5, center=(0, 0, 4.0))
    colors = rng.uniform(0.2, 0.9, size=(len(verts0), 3)).astype(np.float32)

    for fi, shift in enumerate([0.0, dx]):
        verts = verts0 + np.array([shift, 0, 0], np.float32)
        params, config = sugar.init_sugar(verts, faces, vertex_colors=colors)
        params = dataclasses.replace(
            params, densities=jnp.full_like(params.densities, inverse_sigmoid(0.98))
        )
        fdir = os.path.join(root, f"{fi:04d}")
        for sub in ["images", "masks_humanrf", "depth_humanrf", "flow_bi"]:
            os.makedirs(os.path.join(fdir, sub), exist_ok=True)
        for ci, cam in enumerate(cams):
            img, aux = sugar.render(params, config, cam, bg=(0, 0, 0), raster_config=rcfg)
            img = np.clip(np.asarray(img), 0, 1)
            alpha = 1.0 - np.asarray(aux.final_T)
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(fdir, "images", f"img_{ci:04d}.jpg"), quality=95
            )
            Image.fromarray(((alpha > 0.5) * 255).astype(np.uint8)).save(
                os.path.join(fdir, "masks_humanrf", f"img_{ci:04d}_alpha.png")
            )
            d, _ = sugar.render_depth(
                params, config, cam, max_depth=10.0, raster_config=rcfg, use_solid_surface=True
            )
            d = np.asarray(d)
            d = np.where(d > 9.0, 999.0, d)
            np.savez(os.path.join(fdir, "depth_humanrf", f"img_{ci:04d}_depth.npz"), depth=d)

    # Analytic flow for frame 0 -> 1 at HALF resolution, stored (x, y) like RAFT.
    f0 = os.path.join(root, "0000", "flow_bi")
    for ci, cam in enumerate(cams):
        # pixel shift from world dx at depth ~4: d(col) = fx*R[0,:] . dx / z
        R = np.asarray(cams[ci].view)[:3, :3]
        dlocal = R @ np.array([dx, 0, 0])
        shift_col = 120.0 * dlocal[0] / 4.0
        shift_row = 120.0 * dlocal[1] / 4.0
        half = np.zeros((48, 48, 2), np.float32)
        half[..., 0] = shift_col / 2.0  # stored x displacement at 0.5x res
        half[..., 1] = shift_row / 2.0
        np.savez(os.path.join(f0, f"{ci:04d}_f.npz"), flow=half)
        np.savez(os.path.join(f0, f"{ci:04d}_b.npz"), flow=-half)

    # init mesh (frame 0 coarse mesh)
    write_obj(os.path.join(root, "init_mesh_100k.obj"), verts0, faces, colors)
    return cams


def test_sequence_two_frames(tmp_path):
    root = str(tmp_path / "data")
    work = str(tmp_path / "work")
    _build_dataset(root)

    seq = SequenceConfig(
        data_root=root,
        work_root=work,
        frame_0=0,
        frame_end=2,
        interval=1,
        refinement_iterations=12,
        disable_mesh_update=True,  # tiny scene: skip unbind machinery here
        sh_reg=True,
        face_bucket=128,  # tiny scene: exercise bucketing at a small bucket
    )
    rcfg = RasterConfig(max_pairs=1 << 15, chunk=32, max_per_tile=512, impl="jax")
    # Toy-scale scene: coarser agreement, small edge kernel, low edge scalar
    # (reference defaults assume 1.5 MP rigs with mm-scale triangles).
    wcfg = warp_mesh.WarpConfig(
        min_observe=2, depth_agreement=0.1, edge_threshold=0.7,
        depth_edge_ker_size=3, edge_scalar=100.0,
    )
    run_sequence(seq, raster_cfg=rcfg, warp_cfg=wcfg)

    # Frame 0 artifacts
    assert os.path.exists(os.path.join(work, "0000", "12.npz"))
    assert os.path.exists(os.path.join(work, "0000", "0000.ply"))
    assert os.path.exists(os.path.join(work, "0000", "color_mesh.obj"))
    # Warped coarse mesh for frame 1 moved in +x
    wv, wf, _ = read_obj(os.path.join(work, "0001", "coarse_mesh", "warp_smooth.obj"))
    v0, f0, _ = read_obj(os.path.join(work, "0000", "color_mesh.obj"))
    move = wv.mean(axis=0) - v0.mean(axis=0)
    assert move[0] > 0.01, move  # warped toward the frame-1 position
    # Frame 1 artifacts
    assert os.path.exists(os.path.join(work, "0001", "12.npz"))
    assert os.path.exists(os.path.join(work, "0001", "color_mesh.obj"))


def test_checkpoint_color_prior_carries_sh_rest():
    """VERDICT r2 item 7: the next frame's SH must initialize from the previous
    CHECKPOINT (dc AND rest, refine.py:325-383), not the color_mesh.obj
    round-trip that discards sh_rest."""
    from gaustar_tpu.cameras import index_camera, stack_cameras
    from gaustar_tpu.train.sequence import refine_one_frame

    rng = np.random.default_rng(0)
    verts, faces = icosphere(1, radius=0.5, center=(0, 0, 4.0))
    colors = rng.uniform(0.2, 0.9, size=(len(verts), 3)).astype(np.float32)
    cams = ring_cameras(6, w=64, h=64, focal=80.0)
    rcfg = RasterConfig(max_pairs=1 << 14, chunk=32, max_per_tile=512, impl="jax")

    tparams, tconfig = sugar.init_sugar(verts, faces, vertex_colors=colors)
    gt_images, gt_depths = [], []
    batch = stack_cameras(cams)
    for ci in range(len(cams)):
        cam = index_camera(batch, ci)
        img, d, _ = sugar.render_rgbd(tparams, tconfig, cam, raster_config=rcfg)
        gt_images.append(np.asarray(img))
        gt_depths.append(np.asarray(d))
    gt_images = np.stack(gt_images)
    gt_depths = np.stack(gt_depths)

    seq = SequenceConfig(refinement_iterations=4, disable_mesh_update=True, face_bucket=None)
    p0, *_ = refine_one_frame(
        seq, 0, verts, faces, colors, cams, gt_images, gt_depths, rcfg,
        is_first_frame=True, enable_unbind=False,
    )
    # A distinctly nonzero sh_rest prior (as a trained frame would produce).
    prior = (np.asarray(p0.sh_dc), np.asarray(p0.sh_rest) + 0.3)

    p1, *_ = refine_one_frame(
        seq, 1, verts, faces, colors, cams, gt_images, gt_depths, rcfg,
        is_first_frame=False, enable_unbind=False, num_iterations=1,
        init_sh=prior,
    )
    rest1 = np.asarray(p1.sh_rest)
    # One Adam step moves coefficients by <= ~lr (sh_rest lr = 2.5e-3/20); the
    # prior must survive nearly exactly — without the carry it would be ~0.
    assert np.abs(rest1 - prior[1]).max() < 0.01
    assert np.abs(rest1).max() > 0.25

    # Shape-mismatched prior falls back to vertex colors (sh_rest zeros).
    bad = (prior[0][: len(prior[0]) // 2], prior[1][: len(prior[1]) // 2])
    p2, *_ = refine_one_frame(
        seq, 1, verts, faces, colors, cams, gt_images, gt_depths, rcfg,
        is_first_frame=False, enable_unbind=False, num_iterations=1,
        init_sh=bad,
    )
    assert np.abs(np.asarray(p2.sh_rest)).max() < 0.01
