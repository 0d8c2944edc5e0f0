"""Background AOT prewarm of the detection/fusion device programs.

The reference pays no per-frame kernel compiles (CUDA kernels are built at
install time); the TPU equivalent is hiding XLA's per-shape compile under the
training wall. prewarm_detect / prewarm_fusion AOT-compile the exact programs
detect_topo_err / extract_mesh_fusion later dispatch (jax>=0.9 shares AOT
executables with the normal dispatch path — measured on the tunnel in
examples/refscale_frame.py, REFSCALE.json prewarm_residual_s). These tests pin
the functional contract: prewarm never changes results, and the volume-dim
bucketing keeps fusion's program shapes stable under mm-scale point drift.
"""

import numpy as np
import jax.numpy as jnp

from gaustar_tpu.cameras import stack_cameras
from gaustar_tpu.mesh import tsdf
from gaustar_tpu.mesh.primitives import icosphere
from gaustar_tpu.mesh.topology import build_topology
from gaustar_tpu.models import sugar
from gaustar_tpu.ops.rasterizer import RasterConfig
from gaustar_tpu.train import mesh_update, topo_detect
from gaustar_tpu.utils.synthetic import ring_cameras

W = H = 64
RCFG = RasterConfig(max_pairs=1 << 14, max_padded=1 << 15, chunk=32, max_per_tile=512, impl="jax")


def _tiny_scene():
    rng = np.random.default_rng(3)
    v, f = icosphere(1, radius=0.5, center=(0, 0, 4.0))
    params, config = sugar.init_sugar(
        v, f, vertex_colors=rng.uniform(0.2, 0.9, size=(len(v), 3)).astype(np.float32)
    )
    cams = stack_cameras(ring_cameras(3, w=W, h=H, focal=80.0))
    return params, config, cams, f, v


def test_prewarm_detect_matches_unwarmed():
    params, config, cams, faces, verts = _tiny_scene()
    topo = build_topology(faces, len(verts))
    gt_depths = np.full((3, H, W), 4.0, np.float32)
    dcfg = topo_detect.TopoDetectConfig(min_observe=1, mesh_prop=2, detect_floor=False)

    fw_cold = topo_detect.detect_topo_err(
        params, config, cams, gt_depths, topo, RCFG, dcfg
    )
    # Prewarm with PERTURBED params (different values, same shapes — the
    # mid-training state the background thread sees), then detect again:
    # results must be identical to the cold run.
    import dataclasses

    p2 = dataclasses.replace(params, points=params.points + 0.001)
    topo_detect.prewarm_detect(p2, config, cams, gt_depths.shape, RCFG, dcfg)
    fw_warm = topo_detect.detect_topo_err(
        params, config, cams, gt_depths, topo, RCFG, dcfg
    )
    np.testing.assert_allclose(np.asarray(fw_cold), np.asarray(fw_warm))


def test_prewarm_fusion_then_extract():
    params, config, cams, _, _ = _tiny_scene()
    kw = dict(voxel_size=0.05, sdf_trunc=0.15, max_dim=64, use_orbit_cameras=False,
              solid_opacity=0.995)
    mesh_update.prewarm_fusion(params, config, cams, RCFG, **kw)
    mesh = mesh_update.extract_mesh_fusion(params, config, cams, RCFG, **kw)
    assert len(mesh.faces) > 0 and np.isfinite(mesh.verts).all()


def test_fit_volume_dims_bucketed_and_stable():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.5, 0.5, size=(1000, 3)).astype(np.float32)
    vol = tsdf.fit_volume_to_points(pts, 0.01, 0.03)
    dims = vol.tsdf.shape
    assert all(d % 16 == 0 for d in dims)
    # mm-scale drift (what training does to gaussian centers between a
    # mid-refine prewarm and the post-training fusion) keeps the same dims,
    # so the AOT-compiled fusion program's shapes survive.
    vol2 = tsdf.fit_volume_to_points(pts + rng.normal(0, 2e-4, pts.shape), 0.01, 0.03)
    assert vol2.tsdf.shape == dims
    # max_dim still caps bucketed dims.
    vol3 = tsdf.fit_volume_to_points(pts * 100.0, 0.01, 0.03, max_dim=48)
    assert max(vol3.tsdf.shape) <= 48 and vol3.truncated
