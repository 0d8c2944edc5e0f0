"""Assemble/composite layout candidates (ROOFLINE.md row: ~15 ms f+b, ideal ~2).

The current pallas path assembles THREE maps separately from [T, P, C]-layout
tiles (color C=4, final_T, n_contrib) plus a [T, C, P] -> [T, P, C] transpose
on the kernel output. [T, P, C] puts C = 3/4 in the lane dimension (3/128
utilization); candidates keep channels-major [8, H, W] until the last moment.

Run on the real chip: python examples/profile_assemble.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from gaustar_tpu.ops.blend_jax import assemble_image
from gaustar_tpu.ops.projection import TILE
from gaustar_tpu.utils.profiling import loop_bench

W, H = 1600, 1024
GX, GY = (W + TILE - 1) // TILE, (H + TILE - 1) // TILE
T = GX * GY
PIX = TILE * TILE
CH = 4

rng = np.random.default_rng(0)


def assemble_cm(raw, grid_x, grid_y, width, height):
    """[T, 8, PIX] raw kernel output -> [8, H, W] channels-major, ONE relayout."""
    x = raw.reshape(grid_y, grid_x, 8, TILE, TILE)
    x = x.transpose(2, 0, 3, 1, 4).reshape(8, grid_y * TILE, grid_x * TILE)
    return x[:, :height, :width]


def main():
    raw = jnp.asarray(rng.standard_normal((T, 8, PIX)), jnp.float32)
    bg = jnp.asarray([0.0, 1.0, 0.0, 10.0], jnp.float32)

    def current(i, raw):
        r = raw + i * 0.0
        color_t = r[:, 0:CH, :].transpose(0, 2, 1)  # [T, P, C]
        final_t_t = r[:, 3, :]
        ncontrib_t = r[:, 4, :]
        color = assemble_image(color_t, GX, GY, W, H)
        final_t = assemble_image(final_t_t[..., None], GX, GY, W, H)[..., 0]
        n_contrib = assemble_image(ncontrib_t[..., None], GX, GY, W, H)[..., 0]
        img = color + final_t[..., None] * bg
        return img.sum() + n_contrib.sum()

    def current_fb(i, raw):
        l, g = jax.value_and_grad(lambda r: current(i, r))(raw)
        return l + g.sum()

    def cand_cm(i, raw):
        r = raw + i * 0.0
        maps = assemble_cm(r, GX, GY, W, H)  # [8, H, W]
        img_cm = maps[0:CH] + maps[3][None] * bg[:, None, None]
        img = img_cm.transpose(1, 2, 0)  # [H, W, C] at the API boundary
        return img.sum() + maps[4].sum()

    def cand_cm_fb(i, raw):
        l, g = jax.value_and_grad(lambda r: cand_cm(i, r))(raw)
        return l + g.sum()

    def cand_cm_nhwc_losses(i, raw):
        # keep everything channels-major INCLUDING the loss (no final transpose):
        # upper bound if compute_losses consumed [C, H, W].
        r = raw + i * 0.0
        maps = assemble_cm(r, GX, GY, W, H)
        img_cm = maps[0:CH] + maps[3][None] * bg[:, None, None]
        return img_cm.sum() + maps[4].sum()

    def cand_cm_nhwc_fb(i, raw):
        l, g = jax.value_and_grad(lambda r: cand_cm_nhwc_losses(i, r))(raw)
        return l + g.sum()

    for name, fn in [
        ("current  3x[T,P,C] fwd", current),
        ("current  3x[T,P,C] f+b", current_fb),
        ("cand     [8,H,W]+T fwd", cand_cm),
        ("cand     [8,H,W]+T f+b", cand_cm_fb),
        ("cand     [8,H,W] pure fwd", cand_cm_nhwc_losses),
        ("cand     [8,H,W] pure f+b", cand_cm_nhwc_fb),
    ]:
        t = loop_bench(fn, raw, iters=8)
        print(f"{name:28s} {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
