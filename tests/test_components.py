"""Compositor, metrics, mesh depth rendering, render_seq."""

import os

import numpy as np
import jax.numpy as jnp

from gaustar_tpu.cameras import index_camera
from gaustar_tpu.eval import metrics
from gaustar_tpu.models import sugar
from gaustar_tpu.models.compositor import CompositorEntry, render_composite
from gaustar_tpu.tools.mesh_render import INVALID_DEPTH, render_mesh_depth
from gaustar_tpu.mesh.primitives import icosphere
from gaustar_tpu.utils.synthetic import ring_cameras, synthetic_frame


def test_compositor_two_models():
    from gaustar_tpu.ops.rasterizer import RasterConfig

    # doubled gaussian count needs more per-tile capacity (masked gaussians
    # still occupy tile-list slots, as zero-opacity ones would in the reference)
    rcfg = RasterConfig(max_pairs=1 << 16, chunk=32, max_per_tile=2048, impl="jax")
    params, config, data, target, _ = synthetic_frame(n_cams=1, w=48, h=48, raster_cfg=rcfg)
    cam = index_camera(data.cameras, 0)
    shift = jnp.asarray(
        [[1.0, 0, 0, 0.4], [0, 1.0, 0, 0], [0, 0, 1.0, 0], [0, 0, 0, 1.0]]
    )
    entries = [
        CompositorEntry(target, config),
        CompositorEntry(target, config, transform=shift),
    ]
    img, aux = render_composite(entries, cam, bg=(0, 1, 0), sh_deg=0, raster_config=rcfg)
    img1, _ = sugar.render(target, config, cam, bg=(0, 1, 0), sh_deg=0, raster_config=rcfg)
    img = np.asarray(img)
    img1 = np.asarray(img1)
    # composite covers strictly more non-background pixels than a single model
    nonbg = lambda im: ((np.abs(im - [0, 1, 0]).max(-1)) > 0.1).sum()
    assert nonbg(img) > nonbg(img1) * 1.3
    # masked-out second model == single model
    n = target.scales.shape[0]
    entries2 = [
        CompositorEntry(target, config),
        CompositorEntry(target, config, transform=shift, mask=jnp.zeros(n, bool)),
    ]
    img2, _ = render_composite(entries2, cam, bg=(0, 1, 0), sh_deg=0, raster_config=rcfg)
    np.testing.assert_allclose(np.asarray(img2), img1, atol=1e-5)


def test_metrics_basic():
    rng = np.random.default_rng(0)
    a = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    assert metrics.psnr(a, a) > 80
    assert abs(metrics.ssim(a, a) - 1.0) < 1e-5
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1).astype(np.float32)
    assert 15 < metrics.psnr(a, b) < 30
    out = metrics.evaluate_pairs([a], [b])
    assert set(out) == {"PSNR", "SSIM"}


def test_lpips_requires_weights():
    import pytest

    with pytest.raises(FileNotFoundError):
        metrics.LPIPSVgg(None)


def test_mesh_depth_render():
    verts, faces = icosphere(2, radius=0.5, center=(0, 0, 4.0))
    cam = ring_cameras(1, w=64, h=64, focal=80.0)[0]
    depth, mask, total = render_mesh_depth(verts, faces, cam, max_pairs=1 << 14, max_per_tile=512)
    assert depth.shape == (64, 64)
    # center pixel: front surface at z = 3.5
    assert abs(depth[32, 32] - 3.5) < 0.05, depth[32, 32]
    assert depth[0, 0] == INVALID_DEPTH
    assert mask[32, 32] and not mask[0, 0]
    # silhouette is round-ish: mask area ~ pi * r_pix^2 with r_pix = 0.5*80/4 = 10
    area = mask.sum()
    assert 250 < area < 400, area


def test_render_seq(tmp_path):
    from gaustar_tpu.io import checkpoint as ck
    from gaustar_tpu.train.render_seq import render_sequence
    from gaustar_tpu.ops.rasterizer import RasterConfig

    params, config, data, target, rcfg = synthetic_frame(n_cams=2, w=48, h=48)
    root = str(tmp_path / "data")
    work = str(tmp_path / "work")
    os.makedirs(root, exist_ok=True)
    os.makedirs(os.path.join(work, "0000"), exist_ok=True)
    # dataset cameras file
    cams = ring_cameras(2, w=48, h=48, focal=60.0)
    intr = np.stack([np.diag([60.0, 60.0, 1.0])] * 2)
    extr = np.stack([np.asarray(c.view) for c in cams])
    np.savez(os.path.join(root, "rgb_cameras.npz"), intrinsics=intr, extrinsics=extr,
             shape=np.stack([[48, 48]] * 2))
    ck.save_sugar(os.path.join(work, "0000", "2000.npz"), target, config)
    render_sequence(root, work, 0, 1, iterations=2000, raster_cfg=rcfg)
    assert os.path.exists(os.path.join(work, "0000", "render_b", "render_000000.jpg"))
    assert os.path.exists(os.path.join(work, "0000", "render_d", "depth_000000.npz"))
    d = np.load(os.path.join(work, "0000", "render_d", "depth_000000.npz"))["depth"]
    assert d.shape == (48, 48)


def test_colmap_export(tmp_path):
    from gaustar_tpu.tools import cmr_convert

    rng = np.random.default_rng(0)
    n = 3
    intr = np.stack([np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])] * n)
    extr = []
    for _ in range(n):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        e = np.eye(4)
        e[:3, :3] = q
        e[:3, 3] = rng.normal(size=3)
        extr.append(e)
    extr = np.stack(extr)
    shape = np.stack([[48, 64]] * n)
    cmr_convert.export_colmap(str(tmp_path), intr, extr, shape)
    cams_txt = open(tmp_path / "sparse" / "0" / "cameras.txt").read()
    assert "PINHOLE" in cams_txt and "32.0" in cams_txt  # forced center cx = 64/2
    imgs_txt = open(tmp_path / "sparse" / "0" / "images.txt").read().strip().splitlines()
    row = imgs_txt[4].split()
    q = np.array([float(x) for x in row[1:5]])
    # quaternion round-trips to the rotation
    from gaustar_tpu.utils.general import quaternion_to_matrix
    import jax.numpy as jnp

    R = np.asarray(quaternion_to_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(R, extr[0][:3, :3], atol=1e-5)


def test_cameras_json_roundtrip(tmp_path):
    from gaustar_tpu.io import dataset as ds

    cams = ring_cameras(3, w=64, h=48, focal=70.0)
    path = str(tmp_path / "cameras.json")
    ds.save_cameras_json(path, cams)
    cams2 = ds.load_cameras_json(path)
    for a, b in zip(cams, cams2):
        np.testing.assert_allclose(np.asarray(b.view), np.asarray(a.view), atol=1e-6)
        assert b.width == a.width and b.height == a.height


def test_color_mesh_from_views():
    from gaustar_tpu.tools.cmr_convert import color_mesh_from_views
    from gaustar_tpu.tools.mesh_render import render_mesh_depth

    verts, faces = icosphere(2, radius=0.5, center=(0, 0, 4.0))
    cams = ring_cameras(4, w=64, h=64, focal=80.0)
    intr = np.stack([np.diag([80.0, 80.0, 1.0])] * 4)
    extr = np.stack([np.asarray(c.view) for c in cams])
    cmr = {"intrinsics": intr, "extrinsics": extr}
    depths, images = [], []
    for c in cams:
        d, m, _ = render_mesh_depth(verts, faces, c, max_pairs=1 << 14, max_per_tile=512)
        depths.append(np.where(m, d, 999.0))
        img = np.zeros((64, 64, 3), np.float32)
        img[m] = [0.8, 0.2, 0.1]  # uniform red-ish surface
        images.append(img)
    colors = color_mesh_from_views(verts, faces, np.stack(images), np.stack(depths), cmr)
    seen = (np.abs(colors - [0.8, 0.2, 0.1]).max(-1) < 1e-5)
    assert seen.mean() > 0.55, seen.mean()  # silhouette verts fail depth agreement


def test_profiling_utils():
    from gaustar_tpu.utils.profiling import debug_validate, loop_bench
    import jax.numpy as jnp
    import jax

    dt = loop_bench(lambda i, x: (x * (1.0 + i * 0.0)).sum(), jnp.ones((64, 64)), iters=3)
    assert dt >= 0

    params = {"a": jnp.ones(3)}
    debug_validate(params, name="ok")
    import pytest

    with pytest.raises(FloatingPointError):
        debug_validate({"a": jnp.asarray([1.0, np.nan])}, name="bad")

    class Aux:
        num_pairs = jnp.asarray(100)

    with pytest.raises(OverflowError):
        debug_validate(params, aux=Aux(), max_pairs=50, name="ovf")


def test_size_caps_quantize_bounds_active_tiles():
    """Compile-reuse quantization must NOT inflate max_active_tiles: every unit
    of that cap is a Pallas grid step fwd+bwd, and the 64k pair-scale bucket
    once blew it to 10x the whole tile grid (r5 REFSCALE_SEQ regression)."""
    from gaustar_tpu.ops.rasterizer import RasterConfig, size_caps_to_demand

    cfg = RasterConfig(max_pairs=1 << 20, max_padded=1 << 20, chunk=256,
                       max_active_tiles=1024)
    out = size_caps_to_demand(cfg, 1_000_000, 1_100_000, 1.3,
                              demand_active=855, quantize=1 << 16)
    assert out.max_pairs % (1 << 16) == 0
    assert out.max_active_tiles <= 4096, out.max_active_tiles
