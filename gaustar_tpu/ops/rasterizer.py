"""Public differentiable rasterizer API (tile-based production path).

Pipeline (the TPU re-architecture of cuda_rasterizer/rasterizer_impl.cu:197-338):

    preprocess (jnp, autodiff)            forward.cu:156-256
      -> bin_gaussians (lax.sort)         rasterizer_impl.cu:270-318
      -> gather_pair_data (jnp gather)    [VJP = deterministic segment scatter-add,
                                           replacing backward.cu's float atomics]
      -> blend                            forward.cu:261-374 / backward.cu:400-557
           impl='jax'    pure-XLA vmap-over-tiles (portable, CPU tests)
           impl='pallas' Pallas TPU kernels with custom VJP (hot path)
      -> assemble + background composite  forward.cu:367-373

Static capacities (`max_pairs`, `max_per_tile`) make every shape jit-stable; capacity
overflow is reported in the aux output instead of being silently wrong.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from gaustar_tpu.cameras import Camera
from gaustar_tpu.ops import binning
from gaustar_tpu.ops import blend_jax
from gaustar_tpu.ops.projection import TILE, preprocess
from gaustar_tpu.ops.rasterizer_ref import rasterize_dense


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    max_pairs: int = 1 << 20
    max_padded: int | None = None  # cap on chunk-aligned pair slots (see binning)
    chunk: int = 256  # pallas blend chunk (pairs per VMEM block)
    max_per_tile: int = 2048  # static per-tile capacity of the 'jax' blend impl
    impl: str = "auto"  # 'auto' | 'pallas' | 'jax' | 'dense'
    channels: int = 3
    # Active-tile compaction (pallas impl): blend only the non-empty tiles,
    # bounded by this static capacity (None = dense grid). Most of a typical
    # capture's grid is empty background; compaction skips its per-tile Pallas
    # grid-step overhead. Overflow (more active tiles than the cap) truncates
    # and is reported via RasterAux.num_active for the host auto-retry.
    max_active_tiles: int | None = None

    def resolve_impl(self) -> str:
        if self.impl != "auto":
            return self.impl
        return "pallas" if jax.default_backend() == "tpu" else "jax"


class RasterAux(NamedTuple):
    final_T: jnp.ndarray  # [H, W]
    n_contrib: jnp.ndarray  # [H, W] int32
    radii: jnp.ndarray  # [N] int32
    num_pairs: jnp.ndarray  # [] int32 (overflow if > config.max_pairs)
    num_padded: jnp.ndarray  # [] int32
    num_active: Any = 0  # [] int32 non-empty tiles (overflow if > max_active_tiles)


def rasterize(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,
    camera: Camera,
    bg: Any = (0.0, 0.0, 0.0),
    config: RasterConfig = RasterConfig(),
    means2d_dummy: jnp.ndarray | None = None,
    layout: str = "hwc",
):
    """Render preprocessed gaussian primitives; returns (image [H,W,C], RasterAux).

    `means2d_dummy` replicates the reference's screenspace_points trick
    (sugar_model.py:1266-1276): an all-zero [N, 2] array whose gradient receives
    dL/d(NDC mean2d) — the densifier's statistic (sugar_densifier.py:156-171).

    `layout="cm"` returns the image CHANNELS-MAJOR ([C, H, W]): the Pallas path
    produces channel-major maps natively, and the loss stack's SSIM filter runs
    channels-major too — skipping the [H,W,C] round-trip saves two big
    relayouts (each with a backward counterpart) per step.
    """
    impl = config.resolve_impl()
    W, H = camera.width, camera.height
    g = preprocess(means3d, cov3d, opacities, colors, camera)
    if means2d_dummy is not None:
        # pixel = ndc2pix(ndc): d(pixel)/d(ndc) = S/2 per axis (backward.cu:460-461).
        scale = jnp.asarray([0.5 * W, 0.5 * H], jnp.float32)
        g = g._replace(mean2d=g.mean2d + means2d_dummy * scale)

    if impl == "dense":
        out = rasterize_dense(g, W, H)
        img = out.composite(bg)
        zero = jnp.zeros((), jnp.int32)
        return img, RasterAux(out.final_T, out.n_contrib, out.radii, zero, zero, zero)

    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE
    binned = binning.bin_gaussians(
        g, grid_x, grid_y, config.max_pairs, config.chunk, config.max_padded
    )
    pair_data = binning.gather_pair_data(g, binned)

    if impl == "jax":
        tiles = blend_jax.blend_tiles_jax(
            pair_data, binned, grid_x, grid_y, config.max_per_tile, config.channels
        )
        color_t, final_t_t, ncontrib_t = tiles.color, tiles.final_T, tiles.n_contrib
        color = blend_jax.assemble_image(color_t, grid_x, grid_y, W, H)
        final_t = blend_jax.assemble_image(final_t_t[..., None], grid_x, grid_y, W, H)[..., 0]
        n_contrib = blend_jax.assemble_image(
            ncontrib_t[..., None].astype(jnp.int32), grid_x, grid_y, W, H
        )[..., 0]
    elif impl == "pallas":
        from gaustar_tpu.ops.blend_pallas import blend_tiles_pallas_raw

        n_tiles = grid_x * grid_y
        num_active = (binned.tile_count > 0).sum()
        if config.max_active_tiles is not None and config.max_active_tiles < n_tiles:
            # ACTIVE-TILE COMPACTION: blend only non-empty tiles (static
            # capacity), then scatter their raw states over a background-state
            # canvas. Empty tiles' state is the kernel's own empty block
            # (color 0, T 1, n_contrib 0), so results are identical.
            act, _ = binning.compact_active_tiles(
                binned.tile_count, config.max_active_tiles
            )
            act_c = jnp.minimum(act, n_tiles - 1)
            raw_act = blend_tiles_pallas_raw(
                pair_data,
                binned.tile_start[act_c],
                jnp.where(act < n_tiles, binned.tile_nchunks[act_c], 0),
                jnp.zeros((1,), jnp.int32),
                act_c,
                grid_x,
                grid_y,
                W,
                H,
                config.chunk,
                config.channels,
            )
            row = jnp.arange(8, dtype=jnp.int32)
            empty_state = jnp.where(row == 3, 1.0, 0.0).astype(jnp.float32)
            raw = jnp.broadcast_to(empty_state[None, :, None], (n_tiles, 8, raw_act.shape[2]))
            raw = raw.at[act].set(raw_act, mode="drop")
        else:
            # Raw kernel state [T, 8, P] assembled to [8, H, W] in ONE relayout
            # (color, final_T, n_contrib, fused depth all at once) — see
            # assemble_image_cm. Slices of the [8, H, W] block are cheap views.
            raw = blend_tiles_pallas_raw(
                pair_data,
                binned.tile_start,
                binned.tile_nchunks,
                jnp.zeros((1,), jnp.int32),
                jnp.arange(n_tiles, dtype=jnp.int32),
                grid_x,
                grid_y,
                W,
                H,
                config.chunk,
                config.channels,
            )
        maps = blend_jax.assemble_image_cm(raw, grid_x, grid_y, W, H)  # [8, H, W]
        if config.channels == 3:
            color_cm = maps[0:3]
        else:
            color_cm = jnp.concatenate([maps[0:3], maps[6:7]], axis=0)
        final_t = maps[3]
        n_contrib = maps[4].astype(jnp.int32)
        if layout == "cm":
            img = color_cm + final_t[None] * jnp.asarray(bg, jnp.float32)[:, None, None]
            aux = RasterAux(
                final_T=final_t,
                n_contrib=n_contrib,
                radii=g.radius,
                num_pairs=binned.num_pairs,
                num_padded=binned.num_padded,
                num_active=num_active.astype(jnp.int32),
            )
            return img, aux
        color = color_cm.transpose(1, 2, 0)
    else:
        raise ValueError(f"unknown rasterizer impl: {impl}")

    img = color + final_t[..., None] * jnp.asarray(bg, jnp.float32)
    if layout == "cm":
        img = img.transpose(2, 0, 1)  # non-pallas impls: correct, not fast
    aux = RasterAux(
        final_T=final_t,
        n_contrib=n_contrib,
        radii=g.radius,
        num_pairs=binned.num_pairs,
        num_padded=binned.num_padded,
        num_active=(binned.tile_count > 0).sum().astype(jnp.int32),
    )
    return img, aux


def capacity_overflow(aux: RasterAux, config: RasterConfig, grid_x: int, grid_y: int) -> bool:
    """True if the render truncated pairs or active tiles (host sync)."""
    import numpy as np

    if int(np.asarray(aux.num_pairs)) > config.max_pairs:
        return True
    if config.max_active_tiles is not None and int(
        np.asarray(aux.num_active)
    ) > config.max_active_tiles:
        return True
    cap = binning.default_capacity(
        config.max_pairs, grid_x * grid_y, config.chunk, config.max_padded
    )
    return int(np.asarray(aux.num_padded)) > cap


def grow_config(config: RasterConfig, aux: RasterAux) -> RasterConfig:
    """Return a config with capacities doubled past the observed demand."""
    import numpy as np

    need_pairs = int(np.asarray(aux.num_pairs))
    need_padded = int(np.asarray(aux.num_padded))
    new_pairs = max(2 * config.max_pairs, need_pairs)
    new_padded = None
    if config.max_padded is not None:
        new_padded = max(2 * config.max_padded, need_padded)
    new_active = config.max_active_tiles
    if new_active is not None:
        new_active = max(2 * new_active, int(np.asarray(aux.num_active)))
    return dataclasses.replace(
        config, max_pairs=new_pairs, max_padded=new_padded, max_active_tiles=new_active
    )


def probe_pair_demand(means3d, cov3d, opacities, cameras, config: RasterConfig):
    """Max (num_pairs, num_padded) over a BATCH of cameras (stacked Camera
    pytree) — one jitted scan, two scalars fetched.

    The CUDA rasterizer sizes its pair buffers exactly per call
    (rasterizer_impl.cu:277-303); XLA's static shapes cannot, and every
    pair-scale op (gathers/scatters/sorts/fills, ~45 ms of the reference-scale
    step) costs proportionally to the STATIC capacity, not the live demand.
    Probing the scene once and jitting with `size_caps_to_demand` recovers the
    CUDA sizing discipline at a one-off compile cost; the overflow auto-retry
    (refine_frame / rasterize_auto) still guards scenes that grow later."""
    import numpy as np

    from gaustar_tpu.cameras import index_camera

    W, H = int(cameras.width), int(cameras.height)
    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE
    n_cams = int(np.asarray(cameras.fx).shape[0])

    @jax.jit
    def run(m, c, o, cams):
        col = jnp.zeros((m.shape[0], 1), jnp.float32)

        def body(carry, i):
            cam = index_camera(cams, i)
            g = preprocess(m, c, o, col, cam)
            b = binning.bin_gaussians(
                g, grid_x, grid_y, config.max_pairs, config.chunk, config.max_padded
            )
            return carry, (b.num_pairs, b.num_padded, (b.tile_count > 0).sum())

        _, (n_p, n_pad, n_act) = jax.lax.scan(body, None, jnp.arange(n_cams))
        return n_p.max(), n_pad.max(), n_act.max()

    n_p, n_pad, n_act = run(means3d, cov3d, opacities, cameras)
    import numpy as _np

    return int(_np.asarray(n_p)), int(_np.asarray(n_pad)), int(_np.asarray(n_act))


def size_caps_to_demand(
    config: RasterConfig,
    demand_pairs: int,
    demand_padded: int,
    headroom: float = 1.15,
    demand_active: int | None = None,
    quantize: int | None = None,
) -> RasterConfig:
    """Config with capacities sized to measured demand x headroom (see
    probe_pair_demand). max_pairs rounds up to 1024, max_padded to the chunk,
    max_active_tiles (when probed) to 256.

    `quantize` (compile-reuse mode, train/bucketing.py): round every capacity
    up to a multiple of this bucket instead, so frame-to-frame demand drift
    keeps the SAME static shapes and the compiled step program is reused
    (capacities are static shapes — any change recompiles)."""
    qp = quantize if quantize else 1024
    pairs = -(-int(demand_pairs * headroom) // qp) * qp
    padded = max(int(demand_padded * headroom), pairs)
    qd = quantize if quantize else config.chunk
    padded = -(-padded // qd) * qd
    padded = -(-padded // config.chunk) * config.chunk
    active = config.max_active_tiles
    if demand_active is not None:
        # Active-tile counts are SMALL (<= the tile grid, ~6.4k at 1.6 MP) and
        # every unit of this cap is a Pallas grid step fwd+bwd — quantizing it
        # with the pair-scale bucket once inflated it to 65536 (10x the whole
        # grid) and slowed every blend ~10x. Bound its bucket at 1024.
        qa = 256 if quantize is None else min(quantize, 1024)
        active = -(-int(demand_active * headroom) // qa) * qa
    return dataclasses.replace(
        config, max_pairs=pairs, max_padded=padded, max_active_tiles=active
    )


def rasterize_auto(
    means3d,
    cov3d,
    opacities,
    colors,
    camera: Camera,
    bg: Any = (0.0, 0.0, 0.0),
    config: RasterConfig = RasterConfig(),
    max_doublings: int = 4,
):
    """`rasterize` with host-level capacity auto-retry: on num_pairs/num_padded
    overflow the capacities are doubled (re-jit) and the render repeated, so the
    result is never silently truncated (the CUDA path cannot overflow because it
    mallocs the exact size per call, rasterizer_impl.cu:277-303; our static
    shapes need this retry loop instead). Returns (img, aux, config_used)."""
    cfg = config
    grid_x = (camera.width + TILE - 1) // TILE
    grid_y = (camera.height + TILE - 1) // TILE
    for _ in range(max_doublings):
        img, aux = rasterize(means3d, cov3d, opacities, colors, camera, bg, cfg)
        if cfg.resolve_impl() == "dense" or not capacity_overflow(aux, cfg, grid_x, grid_y):
            return img, aux, cfg
        cfg = grow_config(cfg, aux)
    img, aux = rasterize(means3d, cov3d, opacities, colors, camera, bg, cfg)
    if capacity_overflow(aux, cfg, grid_x, grid_y):
        raise OverflowError(
            f"rasterize_auto: still overflowing after {max_doublings} doublings "
            f"(num_pairs={int(aux.num_pairs)}, max_pairs={cfg.max_pairs})"
        )
    return img, aux, cfg
