"""Re-render saved frame checkpoints — render_seq.py:89-124 equivalent.

Loads each frame's SuGaR checkpoint and renders RGB (+ optional depth) per
camera into the reference's render output layout (render_b/ render_d/ dirs,
refined_mesh.py:1063-1153)."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from gaustar_tpu.cameras import index_camera
from gaustar_tpu.io import checkpoint as ck
from gaustar_tpu.io import dataset as ds
from gaustar_tpu.models import sugar
from gaustar_tpu.ops.rasterizer import RasterConfig


def render_sequence(
    data_root: str,
    work_root: str,
    frame_0: int,
    frame_end: int,
    interval: int = 1,
    iterations: int = 2000,
    render_modes: str = "bd",  # 'b' rgb, 'd' depth (render_seq.py render_results)
    raster_cfg: RasterConfig | None = None,
    max_depth: float = 10.0,
    downscale: float = 1.0,
):
    raster_cfg = raster_cfg or RasterConfig()
    cmr = ds.load_rgb_cameras(os.path.join(data_root, "rgb_cameras.npz"))
    cams = ds.cameras_from_npz(cmr, downscale)
    from gaustar_tpu.cameras import stack_cameras

    batch = stack_cameras(cams)

    for f_idx in range(frame_0, frame_end, interval):
        fdir = os.path.join(work_root, f"{f_idx:04d}")
        ckpt = os.path.join(fdir, f"{iterations}.npz")
        if not os.path.exists(ckpt):
            raise FileNotFoundError(ckpt)
        params, config, _ = ck.load_sugar(ckpt)

        if "b" in render_modes:
            os.makedirs(os.path.join(fdir, "render_b"), exist_ok=True)
        if "d" in render_modes:
            os.makedirs(os.path.join(fdir, "render_d"), exist_ok=True)

        for ci in range(len(cams)):
            cam = index_camera(batch, ci)
            if "b" in render_modes:
                img, _ = sugar.render(
                    params, config, cam, bg=(0.0, 1.0, 0.0), raster_config=raster_cfg
                )
                arr = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
                Image.fromarray(arr).save(
                    os.path.join(fdir, "render_b", f"render_{ci:06d}.jpg")
                )
            if "d" in render_modes:
                depth, _ = sugar.render_depth(
                    params, config, cam, max_depth=max_depth, raster_config=raster_cfg
                )
                np.savez_compressed(
                    os.path.join(fdir, "render_d", f"depth_{ci:06d}.npz"),
                    depth=np.asarray(depth),
                )
